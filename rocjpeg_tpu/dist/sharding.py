"""Sharded batched decode over a device mesh.

The TPU-native replacement for the reference's multi-device story (one
DRM render node per handle, src/rocjpeg_vaapi_decoder.cpp:365-422): a batch
of images is sharded over the ``data`` mesh axis and, optionally, each
image's block rows over ``space``; one XLA program decodes the whole batch
with all chips working in parallel. No NCCL analog is needed — XLA inserts
any resharding collectives, and they ride ICI.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.bitstream import JpegStreamParams
from ..pipeline import bucket_batch, output_pitches, stack_group_inputs
from ..runtime import host_decode
from ..status import RocJpegError, Status
from ..types import (ChromaSubsampling, CropRectangle, DecodedImage,
                     DecodeParams, OutputFormat)
from . import mesh as mesh_lib

CSS = ChromaSubsampling


@functools.lru_cache(maxsize=128)
def _sharded_decode(mesh: Mesh, css: CSS, width: int, height: int,
                    luma_blocks: tuple, chroma_blocks: Optional[tuple],
                    output_format: OutputFormat, crop: Optional[tuple]):
    """Jit the decode program with batch ('data') and block-row ('space')
    shardings baked in."""
    from ..pipeline import build_decode_fn
    base = build_decode_fn(css, width, height, chroma_blocks is not None,
                           output_format, crop)
    space = mesh.shape["space"]

    def coeff_spec(blocks):
        # Shard block rows over 'space' only when evenly divisible; chroma
        # planes of small images fall back to batch-only sharding.
        if blocks is not None and blocks[0] % space == 0:
            return NamedSharding(mesh, P("data", "space"))
        return NamedSharding(mesh, P("data"))

    y_sh = coeff_spec(luma_blocks)
    c_sh = coeff_spec(chroma_blocks)
    q_sh = NamedSharding(mesh, P("data"))
    out_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        base,
        in_shardings=(y_sh, c_sh, c_sh, q_sh, q_sh, q_sh),
        out_shardings=out_sh,
    )


class MeshDecoder:
    """Batch decoder sharding work across every device of a mesh.

    API-compatible with :class:`rocjpeg_tpu.api.Decoder` for
    ``decode_batched`` / ``decode`` / ``get_image_info``.
    """

    def __init__(self, mesh: Optional[Mesh] = None, space: int = 1):
        self.mesh = mesh or mesh_lib.make_mesh(space=space)
        from ..api import Decoder  # host-side helpers (validation, info)
        self._host = Decoder.__new__(Decoder)
        from ..types import TpuDecodeSpec
        self._host._spec = TpuDecodeSpec(name="tpu-mesh")
        self._host._device = None
        self.spec = self._host._spec

    def get_image_info(self, stream):
        return self._host.get_image_info(stream)

    def decode(self, stream, params: Optional[DecodeParams] = None):
        return self.decode_batched([stream], params)[0]

    def decode_batched(self, streams: Sequence, params=None) -> List[DecodedImage]:
        if streams is None or any(s is None for s in streams):
            raise RocJpegError(Status.INVALID_PARAMETER, "null stream handle")
        params = params or DecodeParams()
        fmt = OutputFormat(params.output_format)
        stream_params = [s.params for s in streams]
        for p in stream_params:
            self._host._validate(p)

        n_data = self.mesh.shape["data"]
        groups = {}
        for idx, p in enumerate(stream_params):
            key = (p.chroma_subsampling, p.picture_width, p.picture_height,
                   tuple(c.h_sampling_factor for c in p.components),
                   tuple(c.v_sampling_factor for c in p.components))
            groups.setdefault(key, []).append(idx)

        results: List[Optional[DecodedImage]] = [None] * len(streams)
        for key, idxs in groups.items():
            plist = [stream_params[i] for i in idxs]
            p0 = plist[0]
            crop = params.crop_rectangle
            if crop is not None and not (
                    0 < crop.width <= p0.picture_width
                    and 0 < crop.height <= p0.picture_height):
                crop = None
            crop_key = (crop.left, crop.top, crop.right, crop.bottom) if crop else None

            coeffs = host_decode.decode_coefficients_batch(plist)
            # Pad the batch to a power-of-two bucket that is also a multiple
            # of the data-axis size, so every device holds whole images.
            pad_to = bucket_batch(max(len(plist), n_data))
            if pad_to % n_data:
                pad_to = -(-pad_to // n_data) * n_data
            y, u, v, qy, qu, qv = stack_group_inputs(plist, coeffs, pad_to)

            luma_blocks = p0.component_block_dims(0)
            chroma_blocks = (p0.component_block_dims(1)
                             if p0.num_components >= 3 else None)
            fn = _sharded_decode(self.mesh, p0.chroma_subsampling,
                                 p0.picture_width, p0.picture_height,
                                 luma_blocks, chroma_blocks, fmt, crop_key)
            space = self.mesh.shape["space"]

            def coeff_sh(blocks):
                if blocks is not None and blocks[0] % space == 0:
                    return NamedSharding(self.mesh, P("data", "space"))
                return NamedSharding(self.mesh, P("data"))

            y_sh = coeff_sh(luma_blocks)
            c_sh = coeff_sh(chroma_blocks)
            q_sh = NamedSharding(self.mesh, P("data"))
            args = [jax.device_put(a, s) for a, s in
                    ((y, y_sh), (u, c_sh), (v, c_sh),
                     (qy, q_sh), (qu, q_sh), (qv, q_sh))]
            outs = fn(*args)
            pitches = output_pitches(p0.chroma_subsampling, p0.picture_width,
                                     p0.picture_height, fmt,
                                     CropRectangle(*crop_key) if crop_key else None)
            for j, i in enumerate(idxs):
                img = DecodedImage.empty()
                for ci, (arr, pitch) in enumerate(zip(outs, pitches)):
                    img.channel[ci] = arr[j]
                    img.pitch[ci] = pitch
                results[i] = img
        return results
