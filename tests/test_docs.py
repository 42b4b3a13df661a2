"""API-documentation parity (the reference documents every entry point,
enum, and struct field — api/rocjpeg.h:40-343 rendered by Doxygen).

Asserts (1) every public symbol of the API surface carries a docstring,
(2) the generated per-symbol reference (docs/api_reference.md) exists,
contains every public symbol, and has no undocumented entries — so doc
drift fails the suite instead of accumulating.
"""

import dataclasses
import enum
import inspect
import os

import pytest

DOC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "api_reference.md")

PUBLIC = {
    "rocjpeg_tpu.api": ["JpegStream", "Decoder", "write_channel_into"],
    "rocjpeg_tpu.types": ["ChromaSubsampling", "OutputFormat", "Backend",
                          "CropRectangle", "DecodeParams", "DecodedImage",
                          "LazyChannel", "ImageInfo", "TpuDecodeSpec",
                          "spec_for_device"],
    "rocjpeg_tpu.status": ["Status", "RocJpegError", "get_error_name"],
    "rocjpeg_tpu.capi": None,  # __all__
}


def _symbols():
    import importlib
    for modname, names in PUBLIC.items():
        mod = importlib.import_module(modname)
        for name in (names or mod.__all__):
            yield modname, name, getattr(mod, name)


def test_every_public_symbol_documented():
    missing = []
    for modname, name, obj in _symbols():
        if not inspect.isclass(obj) and not inspect.isfunction(obj):
            continue
        if not (obj.__doc__ or "").strip():
            missing.append(f"{modname}.{name}")
        if inspect.isclass(obj) and not issubclass(obj, enum.Enum) \
                and not dataclasses.is_dataclass(obj):
            for mname, m in vars(obj).items():
                if mname.startswith("_"):
                    continue
                fn = m.fget if isinstance(m, property) else m
                if callable(fn) and not (getattr(fn, "__doc__", "") or "").strip():
                    missing.append(f"{modname}.{name}.{mname}")
    assert not missing, f"undocumented public symbols: {missing}"


def test_reference_doc_generated_and_complete():
    assert os.path.exists(DOC), "docs/api_reference.md missing — run " \
                                "tools/gen_api_doc.py"
    text = open(DOC).read()
    assert "(undocumented)" not in text
    for modname, name, _obj in _symbols():
        assert f"`{name}" in text or f"{name}(" in text, \
            f"{modname}.{name} absent from docs/api_reference.md — " \
            f"regenerate with tools/gen_api_doc.py"


def test_reference_doc_covers_c_abi():
    text = open(DOC).read()
    for sym in ["rocJpegStreamCreate", "rocJpegStreamParse",
                "rocJpegStreamDestroy", "rocJpegCreate", "rocJpegDestroy",
                "rocJpegGetImageInfo", "rocJpegDecode",
                "rocJpegDecodeBatched", "rocJpegGetErrorName",
                "RocJpegStatus", "RocJpegImage", "RocJpegDecodeParams",
                "RocJpegBackend", "RocJpegChromaSubsampling"]:
        assert sym in text, f"C ABI symbol {sym} missing from reference doc"
