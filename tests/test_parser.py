"""Parser unit tests — the coverage the reference lacks (SURVEY.md §4).

Field expectations cross-checked against the reference parser semantics
(src/rocjpeg_parser.cpp) and PIL on the bundled corpus.
"""

import numpy as np
import pytest
from PIL import Image
import io

from rocjpeg_tpu.core.bitstream import JpegStreamParser, classify_subsampling
from rocjpeg_tpu.status import RocJpegError, Status
from rocjpeg_tpu.types import ChromaSubsampling as CSS


def test_parse_corpus_dims(corpus):
    for name, data in corpus.items():
        p = JpegStreamParser().parse(data)
        im = Image.open(io.BytesIO(data))
        assert (p.picture_width, p.picture_height) == im.size


def test_parse_mug_420(corpus):
    p = JpegStreamParser().parse(corpus["mug_420"])
    assert p.chroma_subsampling == CSS.CSS_420
    assert p.num_components == 3
    assert p.components[0].h_sampling_factor == 2
    assert p.components[0].v_sampling_factor == 2
    # num_mcus formula from parser.cpp:197-198
    assert p.num_mcus == ((3840 + 15) // 16) * ((2160 + 15) // 16)
    assert p.load_quantiser_table[:2].all()
    assert len(p.slice_data) > 1000


def test_parse_mug_400_is_grayscale(corpus):
    p = JpegStreamParser().parse(corpus["mug_400"])
    assert p.chroma_subsampling == CSS.CSS_400
    assert p.num_components == 1


def test_parse_mug_422(corpus):
    p = JpegStreamParser().parse(corpus["mug_422"])
    assert p.chroma_subsampling == CSS.CSS_422


def test_reject_missing_soi():
    with pytest.raises(RocJpegError) as e:
        JpegStreamParser().parse(b"\x00\x01\x02\x03" * 10)
    assert e.value.status == Status.BAD_JPEG


def test_reject_truncated_header(corpus):
    # SOI present but no DHT/DQT/SOS.
    with pytest.raises(RocJpegError) as e:
        JpegStreamParser().parse(corpus["mug_420"][:64])
    assert e.value.status == Status.BAD_JPEG


def test_slice_data_ends_before_eoi(corpus):
    data = corpus["mug_420"]
    p = JpegStreamParser().parse(data)
    assert data.endswith(b"\xff\xd9")
    # slice span excludes the EOI marker itself (ParseEOI, parser.cpp:400-416)
    assert not p.slice_data.endswith(b"\xff\xd9")


def test_missing_eoi_uses_rest_of_buffer(corpus):
    data = corpus["mug_420"][:-2]  # chop EOI
    p = JpegStreamParser().parse(data)
    assert len(p.slice_data) > 0


def test_classify_subsampling_table():
    # The exact pattern table from parser.cpp:432-470.
    assert classify_subsampling(1, 1, 1, 1, 1, 1) == CSS.CSS_444
    assert classify_subsampling(2, 2, 2, 2, 2, 2) == CSS.CSS_444
    assert classify_subsampling(4, 4, 4, 4, 4, 4) == CSS.CSS_444
    assert classify_subsampling(1, 1, 1, 2, 1, 1) == CSS.CSS_440
    assert classify_subsampling(2, 1, 1, 1, 1, 1) == CSS.CSS_422
    assert classify_subsampling(2, 1, 1, 2, 2, 2) == CSS.CSS_422
    assert classify_subsampling(2, 2, 2, 2, 1, 1) == CSS.CSS_422
    assert classify_subsampling(2, 1, 1, 2, 1, 1) == CSS.CSS_420
    assert classify_subsampling(4, 1, 1, 1, 1, 1) == CSS.CSS_411
    assert classify_subsampling(1, 0, 0, 1, 0, 0) == CSS.CSS_400
    assert classify_subsampling(4, 0, 0, 4, 0, 0) == CSS.CSS_400
    assert classify_subsampling(3, 1, 1, 1, 1, 1) == CSS.CSS_UNKNOWN


def test_component_block_dims(corpus):
    p = JpegStreamParser().parse(corpus["mug_420"])
    # 3840x2160 at 2x2: luma plane 240x480 blocks, chroma 135x240.
    assert p.component_block_dims(0) == (270, 480)
    assert p.component_block_dims(1) == (135, 240)


def test_reject_progressive_sof():
    """Progressive (SOF2) streams must fail with BAD_JPEG, like the
    reference whose parser only consumes SOF0 (parser.cpp:160; the VCN
    engine is baseline-only)."""
    from rocjpeg_tpu.core.bitstream import JpegStreamParser
    from rocjpeg_tpu.status import RocJpegError
    from rocjpeg_tpu.testing import encoder
    blob = bytearray(encoder.encode_planes(
        encoder.random_planes("420", 64, 64, seed=0), "420"))
    i = blob.find(b"\xff\xc0")
    assert i >= 0
    blob[i + 1] = 0xC2  # SOF0 -> SOF2
    import pytest
    with pytest.raises(RocJpegError):
        JpegStreamParser().parse(bytes(blob))


def test_reject_16bit_quant_tables():
    """Pq=1 (16-bit) DQT entries are rejected (parser.cpp:230-233)."""
    from rocjpeg_tpu.core.bitstream import JpegStreamParser
    from rocjpeg_tpu.status import RocJpegError, Status
    from rocjpeg_tpu.testing import encoder
    blob = bytearray(encoder.encode_planes(
        encoder.random_planes("400", 64, 64, seed=0), "400"))
    i = blob.find(b"\xff\xdb")
    assert i >= 0
    # DQT segment: FF DB len_hi len_lo PqTq ... ; set Pq=1 (16-bit)
    blob[i + 4] |= 0x10
    import pytest
    with pytest.raises(RocJpegError) as e:
        JpegStreamParser().parse(bytes(blob))
    assert e.value.status == Status.BAD_JPEG
