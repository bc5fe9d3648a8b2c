"""Round-7 gate for the REAL image codec (operators/multimodal.py): the
fixture synthesizer must emit genuine PNG containers, `_png_decode` must be
an honest decoder (CRC verification, multi-IDAT, all five scanline
filters), and extract_image_features must compute its statistics from the
DECODED pixels — hand-checked here against known rasters, independent of
the SQL oracle that guards the same math at the registry level."""

import struct
import zlib

import numpy as np
import pytest

from kiji_scoring_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def png_rows(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "x" * 40), (4, "日本\U0001f600")],
        ["doc_id", "text"],
    )
    out = mm.synthesize_png_payloads(df, "doc_id", "text")
    return {r.media_id: (bytes(r.payload) if r.payload is not None else None)
            for r in out.collect()}


def test_payloads_are_real_png_containers(png_rows):
    for mid, (w, h) in [(1, (16, 1)), (2, (16, 1)), (3, (16, 3))]:
        p = png_rows[mid]
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        # independent header parse (not via our decoder): IHDR is always
        # the first chunk, 13 bytes, at offset 16
        assert p[12:16] == b"IHDR"
        gw, gh, depth, ctype = struct.unpack(">IIBB", p[16:26])
        assert (gw, gh, depth, ctype) == (w, h, 8, 0)


def test_decoded_pixels_match_derivation(png_rows):
    w, h, ch, px = mm._png_decode(png_rows[1])
    assert (w, h, ch) == (16, 1, 1)
    # 'abc' -> ords 97,98,99, zero-padded to one 16-px row
    assert list(px[0]) == [97, 98, 99] + [0] * 13


def test_unicode_pixels_fold_mod_256(png_rows):
    # 日(26085) 本(26412) 😀(128512) -> % 256 = 229, 28, 0
    w, h, ch, px = mm._png_decode(png_rows[4])
    assert list(px[0][:3]) == [26085 % 256, 26412 % 256, 128512 % 256]


def test_features_hand_computed(spark):
    df = spark.createDataFrame([(7, "abc")], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_png_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    r = mm.extract_image_features(media).collect()[0]
    assert (r.media_id, r.width, r.height, r.n_channels) == (7, 16, 1, 1)
    assert r.mean_intensity == pytest.approx((97 + 98 + 99) / 16, abs=0)


def test_empty_text_renders_one_zero_row(spark):
    df = spark.createDataFrame([(2, "")], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_png_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    r = mm.extract_image_features(media).collect()[0]
    assert (r.width, r.height, r.n_channels, r.mean_intensity) == (16, 1, 1, 0.0)


def test_null_text_yields_null_payload_not_crash(spark):
    df = spark.createDataFrame([(1, "abc"), (2, None)], ["doc_id", "text"])
    out = {r.media_id: r.payload for r in
           mm.synthesize_png_payloads(df, "doc_id", "text").collect()}
    assert out[2] is None
    assert out[1] is not None


def test_malformed_payloads_raise(spark):
    good = mm._png_encode(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="bad signature"):
        mm._png_decode(b"JFIF not a png")
    with pytest.raises(ValueError, match="bad signature"):
        mm._png_decode(b"")
    corrupt = bytearray(good)
    corrupt[-17] ^= 0xFF  # flip a byte inside IDAT data -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch|truncated"):
        mm._png_decode(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated|missing IHDR"):
        mm._png_decode(good[:20])


def _filtered_png(pixels: np.ndarray, filters: list[int], ch: int = 1) -> bytes:
    """Build a PNG whose scanlines use the GIVEN filter types, applying
    the RFC 2083 filter functions forward — an encoder independent of the
    production one, so the decoder's unfiltering is cross-checked."""
    h = pixels.shape[0]
    stride = pixels.shape[1]
    w = stride // ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = pixels[y].astype(np.int32)
        ft = filters[y]
        raw.append(ft)
        for i in range(stride):
            left = int(line[i - ch]) if i >= ch else 0
            ul = int(prev[i - ch]) if i >= ch else 0
            up = int(prev[i])
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = line[i] - left
            elif ft == 2:
                v = line[i] - up
            elif ft == 3:
                v = line[i] - (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                v = line[i] - pred
            raw.append(v & 0xFF)
        prev = line
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )


def test_all_five_filters_unfilter_correctly():
    rng = np.random.default_rng(1234)
    px = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    payload = _filtered_png(px, filters=[0, 1, 2, 3, 4])
    w, h, ch, got = mm._png_decode(payload)
    assert (w, h, ch) == (6, 5, 1)
    assert (got == px).all()


def test_rgb_and_rgba_color_types_decode():
    rng = np.random.default_rng(99)
    for ch in (3, 4):
        px = rng.integers(0, 256, size=(4, 5 * ch), dtype=np.uint8)
        payload = _filtered_png(px, filters=[4, 3, 1, 2], ch=ch)
        w, h, got_ch, got = mm._png_decode(payload)
        assert (w, h, got_ch) == (5, 4, ch)
        assert (got == px).all()


def test_multi_idat_payloads_decode():
    """Real PNG writers split IDAT; the decoder must concatenate before
    inflating. Re-chunk the single-IDAT encoder output into 3 IDATs."""
    px = np.arange(48, dtype=np.uint8).reshape(3, 16)
    single = mm._png_encode(px)
    # locate the IDAT chunk
    pos = 8
    parts = []
    while pos < len(single):
        (ln,) = struct.unpack_from(">I", single, pos)
        tag = single[pos + 4 : pos + 8]
        data = single[pos + 8 : pos + 8 + ln]
        parts.append((tag, data))
        pos += 12 + ln
    out = b"\x89PNG\r\n\x1a\n"
    for tag, data in parts:
        if tag == b"IDAT":
            third = max(1, len(data) // 3)
            for i in range(0, len(data), third):
                out += mm._png_chunk(b"IDAT", data[i : i + third])
        else:
            out += mm._png_chunk(bytes(tag), data)
    w, h, ch, got = mm._png_decode(out)
    assert (w, h, ch) == (16, 3, 1)
    assert (got == px).all()


def test_apng_roundtrip_multi_frame():
    """The APNG encoder's output must decode back to the exact frames,
    including the fcTL/fdAT shared sequence counter and per-frame zlib
    streams."""
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(3, 4), dtype=np.uint8) for _ in range(5)]
    payload = mm._apng_encode(frames)
    # acTL chunk present and declares 5 frames
    i = payload.index(b"acTL")
    assert struct.unpack(">I", payload[i + 4 : i + 8])[0] == 5
    w, h, ch, got = mm._apng_decode(payload)
    assert (w, h, ch, len(got)) == (4, 3, 1, 5)
    for a, b in zip(frames, got):
        assert (b == a).all()


def test_plain_png_decodes_as_one_frame_animation():
    px = np.arange(32, dtype=np.uint8).reshape(2, 16)
    w, h, ch, frames = mm._apng_decode(mm._png_encode(px))
    assert (w, h, ch, len(frames)) == (16, 2, 1, 1)
    assert (frames[0] == px).all()


def test_apng_default_image_outside_animation_decodes():
    """Spec-valid layout the r7 advice flagged: acTL present but IDAT has
    no preceding fcTL — the default image exists for still readers only
    and is NOT an animation frame. The decoder must return exactly the
    acTL-declared fdAT frames (default image parsed + skipped), not a
    misleading 'acTL declares N, found N+1'."""
    w, h = 4, 2
    default = np.full((h, w, 1), 200, dtype=np.uint8)
    f0 = np.arange(8, dtype=np.uint8).reshape(h, w, 1)
    f1 = (f0 + 100).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def fctl(seq):
        return struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0)

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"acTL", struct.pack(">II", 2, 0))
        + mm._png_chunk(b"IDAT", zlib.compress(mm._filter0_scanlines(default)))
        + mm._png_chunk(b"fcTL", fctl(0))
        + mm._png_chunk(b"fdAT", struct.pack(">I", 1) + zlib.compress(mm._filter0_scanlines(f0)))
        + mm._png_chunk(b"fcTL", fctl(2))
        + mm._png_chunk(b"fdAT", struct.pack(">I", 3) + zlib.compress(mm._filter0_scanlines(f1)))
        + mm._png_chunk(b"IEND", b"")
    )
    gw, gh, ch, frames = mm._apng_decode(payload)
    assert (gw, gh, ch, len(frames)) == (w, h, 1, 2)
    assert (frames[0] == f0.reshape(h, w)).all()
    assert (frames[1] == f1.reshape(h, w)).all()


def test_fctl_without_actl_raises():
    """An fcTL in a payload that never declared acTL is malformed — the
    walk must say so rather than silently treating it as animated."""
    px = np.arange(8, dtype=np.uint8).reshape(2, 4)
    base = mm._png_encode(px)
    fctl = struct.pack(">IIIIIHHBB", 0, 4, 2, 0, 0, 1, 10, 0, 0)
    # splice an fcTL right after IHDR (8 sig + 25 IHDR chunk = 33)
    bad = base[:33] + mm._png_chunk(b"fcTL", fctl) + base[33:]
    with pytest.raises(ValueError, match="fcTL without acTL"):
        mm._apng_decode(bad)


def test_sub_filter_vectorized_multichannel():
    """The cumsum lane vectorization of filter 1 must reproduce the
    per-pixel left recurrence across channel widths and row shapes."""
    rng = np.random.default_rng(4242)
    for ch in (1, 3, 4):
        px = rng.integers(0, 256, size=(8, 32 * ch), dtype=np.uint8)
        payload = _filtered_png(px, filters=[1] * 8, ch=ch)
        w, h, got_ch, got = mm._png_decode(payload)
        assert (w, h, got_ch) == (32, 8, ch)
        assert (got == px).all()


def test_apng_sequence_gap_raises():
    frames = [np.zeros((2, 2), dtype=np.uint8), np.ones((2, 2), dtype=np.uint8)]
    payload = bytearray(mm._apng_encode(frames))
    # corrupt the fdAT sequence number (chunk data starts 8 bytes after tag)
    i = payload.index(b"fdAT")
    old = payload[i + 4 : i + 8]
    payload[i + 4 : i + 8] = struct.pack(">I", struct.unpack(">I", old)[0] + 7)
    # re-CRC so the tamper isn't caught by the CRC check first
    ln = struct.unpack(">I", payload[i - 4 : i])[0]
    data = bytes(payload[i : i + 4 + ln])
    payload[i + 4 + ln : i + 8 + ln] = struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="sequence gap"):
        mm._apng_decode(bytes(payload))


def test_frame_sampler_hand_computed(spark):
    # 'abc': h=1, 1 frame only (min(8, h)); frame 0 = still raster
    df = spark.createDataFrame([(1, "abc"), (2, "x" * 40)], ["doc_id", "text"])
    media = mm.attach_media_columns(
        mm.synthesize_apng_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    rows = mm.sample_frames(media).orderBy("media_id", "frame_idx").collect()
    by_key = {(r.media_id, r.frame_idx): r for r in rows}
    assert len([k for k in by_key if k[0] == 1]) == 1
    r = by_key[(1, 0)]
    assert r.frame_mean == pytest.approx((97 + 98 + 99) / 16, abs=0)
    assert r.frame_peak == 99
    # 'x'*40: h=3 -> 3 frames; frame f: 40 px of (120+f), 8 pads of f
    assert len([k for k in by_key if k[0] == 2]) == 3
    for f in range(3):
        r = by_key[(2, f)]
        assert r.frame_mean == pytest.approx((40 * (120 + f) + 8 * f) / 48, abs=0)
        assert r.frame_peak == 120 + f


def test_embed_payloads_histogram_hand_computed(spark):
    """r7: embed_payloads is a real decoded-pixel intensity histogram.
    'abc' raster: 3 px in bin 3 (97..99 // 32), 13 zero pads in bin 0."""
    df = spark.createDataFrame([(1, "abc"), (2, None)], ["doc_id", "text"])
    png = mm.synthesize_png_payloads(df.filter("text IS NOT NULL"), "doc_id", "text")
    media = mm.attach_media_columns(png, "media_id", "payload")
    r = mm.embed_payloads(media, dim=8).collect()[0]
    assert r.embedding == [13 / 16, 0.0, 0.0, 3 / 16, 0.0, 0.0, 0.0, 0.0]
    with pytest.raises(ValueError, match="divide 256"):
        mm.embed_payloads(media, dim=7)


def test_null_payload_is_missing_asset_not_crash(spark):
    """r7 (review): the module-wide NULL contract must hold through the
    DECODERS too — a NULL payload yields a NULL-features row (image), zero
    rows (frames — explode semantics), and never kills the Arrow batch."""
    png = mm._png_encode(np.array([[97, 98]], dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, None)], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in mm.extract_image_features(df).collect()}
    assert rows[1].width == 2
    assert (rows[2].width, rows[2].height, rows[2].n_channels,
            rows[2].mean_intensity) == (None, None, None, None)
    apng = mm._apng_encode([np.zeros((1, 2), dtype=np.uint8)] * 2)
    df2 = spark.createDataFrame(
        [(1, bytearray(apng)), (2, None)], "media_id long, payload binary"
    )
    out = mm.sample_frames(df2).collect()
    assert sorted((r.media_id, r.frame_idx) for r in out) == [(1, 0), (1, 1)]


def test_malformed_animation_chunks_raise_valueerror_not_structerror():
    """r7 (review): short-but-CRC-valid acTL/fcTL/fdAT must raise the
    documented ValueError (dead-letter contract), never struct.error."""
    base = mm._png_encode(np.zeros((1, 1), dtype=np.uint8))
    # splice a 4-byte acTL (spec: 8) right after IHDR (ends at offset 33)
    bad = base[:33] + mm._png_chunk(b"acTL", b"\x00\x00\x00\x01") + base[33:]
    with pytest.raises(ValueError, match="acTL must be 8 bytes"):
        mm._apng_decode(bad)
    bad2 = base[:33] + mm._png_chunk(b"fcTL", b"\x00" * 20) + base[33:]
    with pytest.raises(ValueError, match="fcTL must be 26 bytes"):
        mm._apng_decode(bad2)


def test_decompression_bomb_rejected_before_materializing():
    """r7 (review): an IDAT that inflates past the IHDR-implied pixel size
    must raise, capped — not allocate whatever the stream expands to."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)  # claims 1x1 gray
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)  # 64 MB of zeros
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", bomb)
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        mm._png_decode(payload)


def test_mime_sniffing_magic_bytes(spark):
    """r7: attach_media_columns sniffs the mime from magic bytes JVM-side
    — real PNG/APNG/WAV containers are recognized, anything else stays
    application/octet-stream, NULL payloads keep NULL metadata."""
    import io
    import wave

    png = mm._png_encode(np.zeros((1, 1), dtype=np.uint8))
    apng = mm._apng_encode([np.zeros((1, 1), dtype=np.uint8)] * 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(b"\x00\x01")
    rows = [(1, bytearray(png)), (2, bytearray(apng)),
            (3, bytearray(buf.getvalue())), (4, bytearray(b"plain bytes")),
            (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, body binary")
    got = {r.media_id: r.meta.mime
           for r in mm.attach_media_columns(df, "doc_id", "body").collect()}
    assert got == {1: "image/png", 2: "image/apng", 3: "audio/wav",
                   4: "application/octet-stream", 5: "application/octet-stream"}


def test_randomized_roundtrip_matches_text_derivation(spark):
    """Seeded randomized-reference gate (mirrors the WAV codec's): random
    unicode-ish text -> synthesize -> REAL decode must reproduce the
    ord%256 raster exactly, including pad geometry."""
    rng = np.random.default_rng(20260814)
    alphabet = list("abz019 .!@") + ["é", "日", "€", "\U0001f600"]
    rows = []
    for i in range(24):
        n = int(rng.integers(0, 40))
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.media_id: bytes(r.payload)
        for r in mm.synthesize_png_payloads(df, "doc_id", "text").collect()
    }
    for i, text in rows:
        w, h, ch, px = mm._png_decode(got[i])
        n = len(text)
        want_h = max(1, -(-n // 16))
        assert (w, h, ch) == (16, want_h, 1), text
        flat = px.reshape(-1)
        assert list(flat[:n]) == [ord(c) % 256 for c in text]
        assert not flat[n:].any()
