"""Seeded randomized-reference gates for the two operators round 6
rewrote: the first-seen-flag running distinct and the real WAV audio
codec. Each compares the distributed implementation against an
independent single-machine reference (pandas / numpy) on adversarial
random data — dense timestamp ties, NULL types, empty and symbol-heavy
texts — shapes the fixture tables only partially produce."""

import random
import string

import pandas as pd
import pytest

from kiji_scoring_spark.operators import multimodal as mm
from kiji_scoring_spark.queries import QUERIES


@pytest.fixture(scope="module")
def random_events_dir(tmp_path_factory):
    """An events.parquet with DENSE ts ties (40 distinct timestamps for
    2000 rows) and 15% NULL event types, micros precision."""
    rng = random.Random(60614)
    d = tmp_path_factory.mktemp("randev")
    base = pd.Timestamp("2025-03-01")
    ts_pool = [base + pd.Timedelta(minutes=7 * i) for i in range(40)]
    types = ["view", "click", "buy", "share", "hide", "rate", "save", "skip"]
    n = 2000
    ids = list(range(n))
    rng.shuffle(ids)
    pdf = pd.DataFrame(
        {
            "event_id": ids,
            "ts": [rng.choice(ts_pool) for _ in range(n)],
            "user_id": [rng.randrange(40) for _ in range(n)],
            "event_type": [
                None if rng.random() < 0.15 else rng.choice(types)
                for _ in range(n)
            ],
            "value": [round(rng.uniform(0, 100), 2) for _ in range(n)],
            "props": ["{}" for _ in range(n)],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_running_distinct_matches_pandas_reference(spark, random_events_dir):
    got = (
        QUERIES["window_running_distinct_types"]
        .fn(spark, random_events_dir)
        .toPandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )

    src = pd.read_parquet(f"{random_events_dir}/events.parquet")
    src = src[src.user_id < 30].sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )
    expect = []
    for uid, grp in src.groupby("user_id", sort=True):
        seen = set()
        for r in grp.itertuples():
            if r.event_type is not None:
                seen.add(r.event_type)
            expect.append((uid, r.event_id, len(seen)))
    want = pd.DataFrame(
        expect, columns=["user_id", "event_id", "n_types_seen"]
    ).sort_values(["user_id", "event_id"], ignore_index=True)

    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.astype({"n_types_seen": "int64"}),
        want.astype({"n_types_seen": "int64"}),
        check_dtype=False,
    )


def test_audio_codec_matches_numpy_reference(spark):
    """300 random printable-ASCII texts (plus hand-picked edges) through
    synthesize → decode must equal features computed directly from the
    text with numpy — including the exact integer-sum mean division."""
    import numpy as np

    rng = random.Random(1337)
    texts = ["", "`", " ", "~" * 7, "a Zb `q", "café 日本語 \U0001F680", "Ω≈ç\n√∫"] + [
        "".join(
            rng.choice(string.ascii_letters + string.digits + " .,!?-_@#")
            for _ in range(rng.randrange(0, 200))
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    media = mm.attach_media_columns(
        mm.synthesize_wav_payloads(df, "doc_id", "text"), "media_id", "payload"
    )
    got = {
        r.media_id: r.asDict() for r in mm.extract_audio_features(media).collect()
    }
    assert len(got) == len(texts)

    for i, t in enumerate(texts):
        # canonical fixture waveform: the modulo fold keeps any codepoint
        # int16-safe and equals (ord-96)*256 on printable ASCII
        s = np.array(
            [((ord(c) + 96) % 128 - 64) * 256 for c in t], dtype=np.int64
        )
        n = len(s)
        a = np.abs(s)
        r = got[i]
        assert r["n_bytes"] == mm.WAV_HEADER_BYTES + 2 * n
        assert r["sample_rate"] == 16_000
        assert r["n_frames"] == n
        assert r["duration_ms"] == n * 1000 // 16_000
        assert r["mean_abs_amplitude"] == (float(a.sum()) / n if n else 0.0)
        assert r["peak_amplitude"] == (int(a.max()) if n else 0)
        assert r["zero_crossings"] == (
            int(((s[1:] * s[:-1]) < 0).sum()) if n > 1 else 0
        )
