"""Output-format rendering: decoded sample planes → the 5 output formats.

Re-expresses the reference's per-format routing switch
(src/rocjpeg_decoder.cpp:143-180) and its helpers:

- NATIVE       → CopyChannel per plane            (decoder.cpp:144-160, :372-399)
- YUV_PLANAR   → GetPlanarYUVOutputFormat          (decoder.cpp:576-605)
- Y            → GetYOutputFormat                  (decoder.cpp:620-636)
- RGB          → ColorConvertToRGB fourcc dispatch (decoder.cpp:450-494)
- RGB_PLANAR   → ColorConvertToRGBPlanar           (decoder.cpp:511-557)

ROI semantics (decoder.cpp:123-141): a crop rectangle is valid iff
0 < right-left <= width and 0 < bottom-top <= height; when valid, the output
is the (top,left)-offset window of the decoded surface. Chroma offsets use
plane arithmetic (top>>1 / left>>1 along subsampled axes) — equivalent to the
reference's byte-offset math for even ROI coordinates. Unlike the
reference's 440 RGB path, chroma ROI offsets are applied for 440 too (the
reference leaves them commented out at decoder.cpp:467-472; not reproduced
as it is visibly a bug, not a behavior).

Functions take ``xp`` (numpy | jax.numpy); plane inputs are MCU-padded
uint8 sample planes straight out of the IDCT stage.
"""

from __future__ import annotations

from typing import Optional

from ..status import RocJpegError, Status
from ..types import ChromaSubsampling, CropRectangle, OutputFormat
from . import color, layout

CSS = ChromaSubsampling

# Per-CSS (h_subsample, v_subsample) of the chroma planes relative to luma.
CHROMA_FACTORS = {
    CSS.CSS_444: (1, 1),
    CSS.CSS_440: (1, 2),
    CSS.CSS_422: (2, 1),
    CSS.CSS_420: (2, 2),
    CSS.CSS_411: (4, 1),
}


def resolve_roi(width: int, height: int, crop: Optional[CropRectangle]):
    """Apply the reference ROI-validity rule (decoder.cpp:123-131). Returns
    (eff_w, eff_h, left, top)."""
    if crop is not None:
        rw, rh = crop.width, crop.height
        if 0 < rw <= width and 0 < rh <= height:
            return rw, rh, crop.left, crop.top
    return width, height, 0, 0


def render_output(xp, css: ChromaSubsampling, planes, width: int, height: int,
                  output_format: OutputFormat,
                  crop: Optional[CropRectangle] = None):
    """Render decoded planes into one of the 5 output formats.

    Args:
      xp: array namespace.
      css: chroma subsampling of the stream.
      planes: (y, u, v) MCU-padded uint8 planes; u/v None for 4:0:0.
      width/height: picture dimensions from SOF.
      output_format / crop: decode params.

    Returns list of (array, pitch) channel entries (RocJpegImage analog).
    """
    css = ChromaSubsampling(css)
    if css in (CSS.CSS_411, CSS.CSS_UNKNOWN):
        # Same rejection as the VCN surface-format switch
        # (vaapi_decoder.cpp:634-637).
        raise RocJpegError(Status.JPEG_NOT_SUPPORTED,
                           f"chroma subsampling {css.name} is not supported")

    eff_w, eff_h, left, top = resolve_roi(width, height, crop)
    y, u, v = planes

    y_roi = y[..., top:top + eff_h, left:left + eff_w]

    if css == CSS.CSS_400:
        return _render_400(xp, y_roi, eff_w, eff_h, output_format)

    hf, vf = CHROMA_FACTORS[css]
    ch_w = eff_w // hf
    ch_h = eff_h // vf
    c_top = top // vf
    c_left = left // hf
    u_roi = u[..., c_top:c_top + ch_h, c_left:c_left + ch_w]
    v_roi = v[..., c_top:c_top + ch_h, c_left:c_left + ch_w]

    fmt = OutputFormat(output_format)
    if fmt == OutputFormat.NATIVE:
        if css == CSS.CSS_444:
            return [(y_roi, eff_w), (u_roi, eff_w), (v_roi, eff_w)]
        if css == CSS.CSS_440:  # 422V: three planes, half-height chroma
            return [(y_roi, eff_w), (u_roi, eff_w), (v_roi, eff_w)]
        if css == CSS.CSS_422:  # packed YUYV in channel 0
            return [(layout.pack_yuyv(xp, y_roi, u_roi, v_roi), 2 * eff_w)]
        if css == CSS.CSS_420:  # NV12: Y + interleaved UV
            return [(y_roi, eff_w),
                    (layout.interleave_uv(xp, u_roi, v_roi), eff_w)]
    elif fmt == OutputFormat.YUV_PLANAR:
        return [(y_roi, eff_w), (u_roi, ch_w), (v_roi, ch_w)]
    elif fmt == OutputFormat.Y:
        return [(y_roi, eff_w)]
    elif fmt in (OutputFormat.RGB, OutputFormat.RGB_PLANAR):
        u_full = layout.upsample_to_luma(xp, u_roi, hf, vf)
        v_full = layout.upsample_to_luma(xp, v_roi, hf, vf)
        # Odd dims: nearest upsample of floor-sized chroma can fall one
        # sample short; clamp-pad by edge replication to luma size.
        u_full = _match_size(xp, u_full, eff_h, eff_w)
        v_full = _match_size(xp, v_full, eff_h, eff_w)
        r, g, b = color.yuv_to_rgb(xp, y_roi, u_full, v_full)
        if fmt == OutputFormat.RGB:
            return [(layout.interleave_rgb(xp, r, g, b), 3 * eff_w)]
        return [(r, eff_w), (g, eff_w), (b, eff_w)]

    raise RocJpegError(Status.INVALID_PARAMETER,
                       f"invalid output format {output_format}")


def _render_400(xp, y_roi, eff_w: int, eff_h: int, output_format: OutputFormat):
    """4:0:0 routing: NATIVE/YUV_PLANAR/Y all return the luma plane only
    (rocjpeg.h:129-132); RGB replicates Y (hip_kernels.cpp:1915-1927)."""
    fmt = OutputFormat(output_format)
    if fmt in (OutputFormat.NATIVE, OutputFormat.YUV_PLANAR, OutputFormat.Y):
        return [(y_roi, eff_w)]
    if fmt == OutputFormat.RGB:
        return [(layout.interleave_rgb(xp, y_roi, y_roi, y_roi), 3 * eff_w)]
    if fmt == OutputFormat.RGB_PLANAR:
        return [(y_roi, eff_w), (y_roi, eff_w), (y_roi, eff_w)]
    raise RocJpegError(Status.INVALID_PARAMETER,
                       f"invalid output format {output_format}")


def _match_size(xp, plane, h: int, w: int):
    """Edge-replicate pad the trailing 2 axes up to (h, w) if short (odd-dim
    nearest upsampling)."""
    ph, pw = plane.shape[-2], plane.shape[-1]
    if ph < h:
        pad = xp.repeat(plane[..., ph - 1:ph, :], h - ph, axis=-2)
        plane = xp.concatenate([plane, pad], axis=-2)
    if pw < w:
        pad = xp.repeat(plane[..., :, pw - 1:pw], w - pw, axis=-1)
        plane = xp.concatenate([plane, pad], axis=-1)
    return plane[..., :h, :w]
