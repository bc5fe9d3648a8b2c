"""Round-9 gate for the REAL compressed-video codec
(operators/multimodal.py): `_jpeg_encode` must emit genuine baseline
JFIF JPEGs (marker framing, Annex K tables, byte-stuffed Huffman
bitstream), `_jpeg_decode_at` must be an honest full-baseline decoder
(Huffman + dequantize + IDCT, interleaved MCUs, restart markers, loud
subset errors), `_mjpeg_decode` must split raw Motion-JPEG streams, and
`sample_mjpeg_frames` must compute per-frame statistics from the DECODED
pixels — hand-checked here independent of the SQL oracle that guards the
same math at the registry level (`multimodal_mjpeg_motion`).

The two keystone properties:

1. FLAT 8x8 blocks round-trip EXACTLY (DC-only spectrum, step-1 DC
   quantizer) — the property the fixture-oracle grammar stands on.
2. For ARBITRARY images the decoder's output equals an independent
   numpy quantize-dequantize-IDCT expectation BIT-FOR-BIT — which pins
   the entire entropy layer (categories, run-lengths, ZRL/EOB, byte
   stuffing, padding) as lossless, the part of a JPEG codec that can
   actually be wrong in subtle ways.
"""

import struct

import numpy as np
import pytest

from kiji_scoring_spark.operators import multimodal as mm


def _flat_img(bvals):
    return np.kron(np.asarray(bvals, np.uint8), np.ones((8, 8), np.uint8))


def _expected_reconstruction(img):
    """Independent float-math expectation: pad-to-8, orthonormal DCT,
    round(coef/Q)*Q, IDCT, +128, round, clamp, crop."""
    h, w = img.shape
    a = np.pad(img, ((0, -h % 8), (0, -w % 8)), mode="edge").astype(float) - 128
    k = np.arange(8.0)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    c[0, :] = 0.5 / np.sqrt(2.0)
    q = np.asarray(mm._JPEG_QT, float).reshape(8, 8)
    bh, bw = a.shape[0] // 8, a.shape[1] // 8
    blocks = a.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    qc = np.rint(np.einsum("ij,njk,lk->nil", c, blocks, c) / q) * q
    rec = np.einsum("ji,njk,kl->nil", c, qc, c)
    rec = np.clip(np.rint(rec + 128), 0, 255).astype(np.uint8)
    return (
        rec.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )[:h, :w]


def test_encode_emits_real_baseline_jfif():
    p = mm._jpeg_encode(np.zeros((8, 8), np.uint8))
    # independent marker walk (not via our decoder)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    markers, pos = [], 2
    while pos < len(p) - 2:
        assert p[pos] == 0xFF
        m = p[pos + 1]
        markers.append(m)
        ln = struct.unpack(">H", p[pos + 2 : pos + 4])[0]
        if m == 0xDA:  # entropy data follows the SOS header
            break
        pos += 2 + ln
    assert markers[:2] == [0xE0, 0xDB]  # JFIF APP0, then DQT
    assert 0xC0 in markers and markers.count(0xC4) == 2  # SOF0 + 2 DHTs
    sof = p.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack(">BHHB", p[sof + 4 : sof + 10])
    assert (prec, h, w, nc) == (8, 8, 8, 1)


def test_flat_blocks_roundtrip_exactly():
    rng = np.random.RandomState(11)
    bvals = rng.randint(0, 256, size=(7, 3))
    img = _flat_img(bvals)
    w, h, planes = mm._jpeg_decode(mm._jpeg_encode(img))
    assert (w, h) == (24, 56) and len(planes) == 1
    assert (planes[0] == img).all()


def test_arbitrary_image_matches_float_expectation_bitwise():
    # non-multiple-of-8 dims exercise edge padding + crop; random pixels
    # exercise every AC path (runs, ZRL, byte stuffing, both signs)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(21, 13)).astype(np.uint8)
    w, h, planes = mm._jpeg_decode(mm._jpeg_encode(img))
    assert (w, h) == (13, 21) and planes[0].shape == (21, 13)
    assert (planes[0] == _expected_reconstruction(img)).all()
    # and it is genuinely lossy on noise (this is a real DCT codec, not
    # a disguised identity transform)
    assert (planes[0] != img).any()


def test_byte_stuffing_survives():
    # a high-contrast checkerboard produces dense large coefficients and
    # with the step-1 DC quantizer reliably lands 0xFF bytes in the
    # entropy stream; the decode must still be exact vs expectation
    img = np.indices((16, 16)).sum(0) % 2 * 255
    img = img.astype(np.uint8)
    enc = mm._jpeg_encode(img)
    assert b"\xff\x00" in enc[2:-2]  # stuffing actually happened
    _, _, planes = mm._jpeg_decode(enc)
    assert (planes[0] == _expected_reconstruction(img)).all()


def test_restart_markers_and_dri():
    # hand-build a 2-MCU image encoded as two independent entropy runs
    # separated by RST0, with DRI=1: decoder must byte-align, consume the
    # marker, and reset the DC predictor (block 2's DC is absolute again)
    img = _flat_img([[10, 200]])
    base = mm._jpeg_encode(img)
    # re-encode manually: encode each block as its own 8x8 JPEG, then
    # splice block 2's entropy bits after a RST0 into a DRI-carrying file
    one = mm._jpeg_encode(_flat_img([[10]]))
    two = mm._jpeg_encode(_flat_img([[200]]))

    def entropy(p):
        sos = p.index(b"\xff\xda")
        ln = struct.unpack(">H", p[sos + 2 : sos + 4])[0]
        return p[sos + 2 + ln : -2]

    sos = base.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x01"
    ln = struct.unpack(">H", base[sos + 2 : sos + 4])[0]
    spliced = (
        base[: sos]
        + dri
        + base[sos : sos + 2 + ln]
        + entropy(one)
        + b"\xff\xd0"
        + entropy(two)
        + b"\xff\xd9"
    )
    w, h, planes = mm._jpeg_decode(spliced)
    assert (planes[0] == img).all()


def test_honest_subset_errors_are_loud():
    good = mm._jpeg_encode(np.zeros((8, 8), np.uint8))
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        mm._jpeg_decode(prog)
    twelve = bytearray(good)
    twelve[good.index(b"\xff\xc0") + 4] = 12  # precision byte
    with pytest.raises(ValueError, match="8-bit"):
        mm._jpeg_decode(bytes(twelve))
    with pytest.raises(ValueError, match="SOI"):
        mm._jpeg_decode(b"\x00" + good)
    with pytest.raises(ValueError, match="truncated|marker"):
        mm._jpeg_decode(good[:-4])
    with pytest.raises(ValueError, match="trailing"):
        mm._jpeg_decode(good + b"zz")


def test_dimension_bomb_guard():
    good = bytearray(mm._jpeg_encode(np.zeros((8, 8), np.uint8)))
    sof = good.index(b"\xff\xc0")
    good[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="guard"):
        mm._jpeg_decode(bytes(good))


def test_mjpeg_split_and_cap():
    frames = [_flat_img([[f, f + 100]]) for f in (0, 50, 100)]
    stream = mm._mjpeg_encode(frames)
    w, h, lumas = mm._mjpeg_decode(stream)
    assert (w, h, len(lumas)) == (16, 8, 3)
    assert all((l == f).all() for l, f in zip(lumas, frames))
    _, _, capped = mm._mjpeg_decode(stream, max_frames=2)
    assert len(capped) == 2
    with pytest.raises(ValueError, match="size changed"):
        mm._mjpeg_decode(stream + mm._jpeg_encode(np.zeros((8, 24), np.uint8)))
    with pytest.raises(ValueError, match="no frames"):
        mm._mjpeg_decode(b"")


def test_mime_sniff_tags_jpeg(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_mjpeg_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    assert media.collect()[0].meta.mime == "image/jpeg"


def test_frame_stats_hand_computed(spark):
    # 'abc' -> blocks [97,98 / 99,0] -> h=2 -> 2 frames of 16x16 px
    df = spark.createDataFrame([(7, "abc")], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_mjpeg_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    rows = sorted(mm.sample_mjpeg_frames(media).collect(), key=lambda r: r.frame_idx)
    assert len(rows) == 2
    assert rows[0].frame_peak == 99
    assert rows[0].frame_mean == pytest.approx((97 + 98 + 99 + 0) / 4, abs=0)
    assert rows[0].motion_mean is None
    # frame 1: every block steps +1, no wrap -> motion exactly 1.0
    assert rows[1].frame_peak == 100 and rows[1].motion_mean == 1.0


def test_motion_wrap_counts_255(spark):
    # chr(255) block wraps 255->0 at frame 1: |0-255| = 255; the space
    # block and 0 pads step +1 -> motion = (255 + 3) / 4 per pixel
    df = spark.createDataFrame([(9, chr(255) + " " * 2)], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_mjpeg_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    rows = {r.frame_idx: r for r in mm.sample_mjpeg_frames(media).collect()}
    assert rows[1].motion_mean == pytest.approx((255 + 3) / 4, abs=0)


def test_null_payload_yields_zero_rows(spark):
    df = spark.createDataFrame([(1, "abc"), (2, None)], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_mjpeg_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    rows = mm.sample_mjpeg_frames(media).collect()
    assert {r.media_id for r in rows} == {1}


def test_color_444_interleaved_mcus_roundtrip():
    # three-component interleave: flat 8x8 macro-blocks must round-trip
    # exactly on all three planes through the generic MCU decode path
    rng = np.random.RandomState(21)
    mb = rng.randint(0, 256, size=(3, 2, 3)).astype(np.uint8)
    col = np.kron(mb, np.ones((8, 8, 1), np.uint8))
    w, h, planes = mm._jpeg_decode(mm._jpeg_encode_color(col, "444"))
    assert (w, h) == (16, 24) and len(planes) == 3
    assert all((planes[c] == col[:, :, c]).all() for c in range(3))


def test_color_420_subsampled_roundtrip():
    # 4:2:0: MCUs of four Y blocks + Cb + Cr; flat 16x16 macro-blocks are
    # flat through the 2x2 box-average, so luma AND the half-resolution
    # chroma planes round-trip exactly
    rng = np.random.RandomState(22)
    mb = rng.randint(0, 256, size=(2, 3, 3)).astype(np.uint8)
    col = np.kron(mb, np.ones((16, 16, 1), np.uint8))
    w, h, planes = mm._jpeg_decode(mm._jpeg_encode_color(col, "420"))
    assert (w, h) == (48, 32)
    assert planes[0].shape == (32, 48) and planes[1].shape == (16, 24)
    assert (planes[0] == col[:, :, 0]).all()
    assert (planes[1] == np.kron(mb[:, :, 1], np.ones((8, 8), np.uint8))).all()
    assert (planes[2] == np.kron(mb[:, :, 2], np.ones((8, 8), np.uint8))).all()


def test_color_420_odd_dimensions_crop():
    # non-multiple-of-16 dims: luma crops to (H, W), chroma to the
    # ceil-half sizes — the component-resolution contract of T.81 A.1.1
    rng = np.random.RandomState(23)
    odd = rng.randint(0, 256, size=(19, 27, 3)).astype(np.uint8)
    w, h, planes = mm._jpeg_decode(mm._jpeg_encode_color(odd, "420"))
    assert (w, h) == (27, 19)
    assert planes[0].shape == (19, 27)
    assert planes[1].shape == (10, 14) and planes[2].shape == (10, 14)


def test_color_encoder_rejects_bad_input():
    with pytest.raises(ValueError, match="YCbCr"):
        mm._jpeg_encode_color(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="subsample"):
        mm._jpeg_encode_color(np.zeros((8, 8, 3), np.uint8), "422")


def test_image_features_dispatch_mixed_formats(spark):
    # one binary column carrying BOTH formats: magic-byte dispatch must
    # route each payload to its real decoder inside one Arrow batch
    df = spark.createDataFrame([(2, "ab"), (3, "ab"), (4, None)], ["doc_id", "text"])
    png = mm.synthesize_png_payloads(
        df.filter("doc_id % 2 = 0"), "doc_id", "text"
    )
    jpg = mm.synthesize_mjpeg_payloads(
        df.filter("doc_id % 2 = 1"), "doc_id", "text", max_frames=1
    )
    media = mm.attach_media_columns(png.unionByName(jpg), "media_id", "payload")
    rows = {r.media_id: r for r in mm.extract_image_features(media).collect()}
    # PNG doc 2: 'ab' -> one 16-px row [97,98,0*14]
    assert (rows[2].width, rows[2].height, rows[2].n_channels) == (16, 1, 1)
    assert rows[2].mean_intensity == pytest.approx((97 + 98) / 16, abs=0)
    # JPEG doc 3: 'ab' -> one block row [97,98] -> 16x8 px, same mean of
    # block values
    assert (rows[3].width, rows[3].height, rows[3].n_channels) == (16, 8, 1)
    assert rows[3].mean_intensity == pytest.approx((97 + 98) / 2, abs=0)
    # NULL asset -> NULL-feature row, id preserved
    assert rows[4].width is None and rows[4].mean_intensity is None


def test_image_features_color_jpeg_component_mean():
    # 3-component JPEG through the same dispatch: n_channels = 3 and the
    # mean spans every decoded sample of every plane at its own size
    col = np.full((16, 16, 3), 100, np.uint8)
    col[:, :, 1] = 40
    col[:, :, 2] = 220
    w, h, planes = mm._jpeg_decode(mm._jpeg_encode_color(col, "420"))
    assert [pl.shape for pl in planes] == [(16, 16), (8, 8), (8, 8)]
    # flat planes -> exact decode; mean = (256*100 + 64*40 + 64*220)/384,
    # computed the way the dispatch does: every sample of every plane
    tot = 256 * 100 + 64 * 40 + 64 * 220
    got = sum(int(p.sum(dtype="int64")) for p in planes) / sum(
        p.size for p in planes
    )
    assert got == pytest.approx(tot / 384, abs=0)


def test_truncated_segment_bodies_raise_valueerror_not_indexerror():
    # r10 (ADVICE): a segment whose DECLARED length undershoots its fixed
    # header must raise the documented ValueError (dead-letterable), not
    # IndexError (batch-killing). Shrinking the 2-byte length field is
    # exactly how a truncated/corrupt writer produces such segments.
    good = mm._jpeg_encode(np.zeros((8, 8), np.uint8))

    def with_seglen(marker: bytes, seglen: int) -> bytes:
        out = bytearray(good)
        at = out.index(marker)
        out[at + 2 : at + 4] = struct.pack(">H", seglen)
        return bytes(out)

    with pytest.raises(ValueError, match="SOF segment truncated"):
        mm._jpeg_decode(with_seglen(b"\xff\xc0", 7))  # body < 6 bytes
    with pytest.raises(ValueError, match="SOF component list truncated"):
        mm._jpeg_decode(with_seglen(b"\xff\xc0", 8))  # nc=1 needs 9
    with pytest.raises(ValueError, match="SOS segment truncated"):
        mm._jpeg_decode(with_seglen(b"\xff\xda", 2))  # empty body
    with pytest.raises(ValueError, match="SOS component list truncated"):
        mm._jpeg_decode(with_seglen(b"\xff\xda", 4))  # ns=1 needs 3
    # DRI with a 1-byte body, placed right after SOI
    dri_short = b"\xff\xd8" + b"\xff\xdd\x00\x03\x00" + good[2:]
    with pytest.raises(ValueError, match="DRI segment truncated"):
        mm._jpeg_decode(dri_short)


def test_mjpeg_synthesis_rejects_width_overflow():
    # r10 (ADVICE): blocks_per_row * 8 must fit the 16-bit SOF width
    # field; 8192 would silently wrap the packed header. Validation runs
    # before any DataFrame work, so no session is needed.
    with pytest.raises(ValueError, match="blocks_per_row"):
        mm.synthesize_mjpeg_payloads(None, "id", "text", blocks_per_row=8192)
    with pytest.raises(ValueError, match="blocks_per_row"):
        mm.synthesize_mjpeg_payloads(None, "id", "text", blocks_per_row=0)
