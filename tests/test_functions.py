"""Unit tests for the Tier-3 function library (text/dedup/similarity/
multimodal) against hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframe_expressions_spark.functions import dedup as D
from dataframe_expressions_spark.functions import multimodal as MM
from dataframe_expressions_spark.functions import similarity as S
from dataframe_expressions_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different words entirely here now"),
        (4, "  spaced   out    tokens  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_drop_empties(spark, docs):
    out = docs.select("doc_id", TX.token_count(F.col("text")).alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    assert got == {1: 9, 2: 9, 3: 6, 4: 3}


def test_char_fingerprint_matches_python(spark, docs):
    out = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", TX.char_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }

    def poly(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc

    rows = {
        1: "the quick brown fox jumps over the lazy dog",
        4: "  spaced   out    tokens  ",
    }
    for did, text in rows.items():
        assert out[did] == poly(text)


def test_minhash_finds_near_dup_pair(spark, docs):
    pairs = D.minhash_near_dup_pairs(
        docs, threshold=0.3, n_hashes=16, bands=8
    ).collect()
    assert any(r.a == 1 and r.b == 2 for r in pairs)
    assert not any({r.a, r.b} == {1, 3} for r in pairs)


def test_simhash_close_for_near_dups(spark, docs):
    out = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", D.simhash63(TX.tokens(F.col("text"))).alias("h")
        ).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 63) - 1)).count("1")  # noqa: E731
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_simhash_matches_portable_python_model(spark, docs):
    """The signature must equal the pure-Python reimplementation of the
    portable arithmetic — the same model the DuckDB oracle mirrors."""

    def poly(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc

    def simhash(text: str) -> int:
        hs = [poly(t) for t in text.split() if t]
        sig = 0
        for i in range(63):
            ones = sum(1 for h in hs if ((2 * i + 1) * h + i * i) % 1_000_000_007 & 1)
            if 2 * ones > len(hs):
                sig |= 1 << i
        return sig

    got = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", D.simhash63(TX.tokens(F.col("text"))).alias("h")
        ).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    for did, text in texts.items():
        assert got[did] == simhash(text), did


def test_cosine_self_similarity(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = S.cosine_topk(emb, [0], k=2).collect()
    by_rank = {r.rk: r for r in out}
    assert by_rank[1].vid == 1 and by_rank[1].sim == 1.0
    assert by_rank[2].vid == 2 and abs(by_rank[2].sim) < 1e-9


def test_multimodal_decode_stub(spark, docs):
    media = MM.attach_fake_image(
        docs.withColumn("n_chars", F.length("text")).select("doc_id", "text")
    )
    out = {r.doc_id: r for r in MM.decode_meta(media).collect()}
    assert out[1].n_bytes == 43 and out[1].width == 43 % 640
    assert out[1].height == (43 * 31) % 480


def test_multimodal_strict_raises(spark, docs):
    """The strict=True contract is the real-codec boundary: at 100 TB what
    breaks jobs is the ERROR SURFACE at the executor (a hang, a segfault,
    or a swallowed error poisons the whole stage), not the happy path.
    Assert the NotImplementedError propagates cleanly through mapInPandas
    from EVERY partition — multi-partition input so the failure crosses
    the Arrow boundary on each worker thread, message intact."""
    media = MM.attach_fake_image(docs.select("doc_id", "text")).repartition(4)

    with pytest.raises(Exception) as exc_info:
        MM.decode_meta(media, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value)
    # fake payloads are neither BMP nor RIFF/WAVE: the magic dispatch
    # exhausts both real codecs and names the missing library
    assert "requires libav" in str(exc_info.value)

    with pytest.raises(Exception) as exc_info:
        MM.frame_sample(media, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value)
    assert "real video demuxing requires libav" in str(exc_info.value)

    # strict=False on the identical multi-partition frame still decodes —
    # the gate is the flag, not partitioning luck
    assert MM.decode_meta(media, strict=False).count() == 4
    assert MM.frame_sample(media, strict=False).count() >= 4


def test_lang_pred_rule(spark):
    rows = [
        (1, "the cat and the dog of a to"),
        (2, "der hund und die katze ist"),
        (3, "el gato y la casa de que"),
        (4, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.p for r in df.select("doc_id", TX.lang_pred(F.col("text")).alias("p")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "unknown"}


def test_connected_components_chain_and_islands(spark):
    """Chain 1-2-3, pair 10-11, singleton via self-pair: min-label
    propagation must converge to the min id per component."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 7)], "a long, b long"
    )
    out = {r.doc_id: r.component for r in D.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7}


def test_token_hash_shingles_matches_string_shingles(spark):
    """The hash-only gram pipeline must agree with the string-shingle
    definition on COUNTS (distinct k-gram hashes ≡ distinct k-gram
    strings bar ~2^-64 collisions) and on the empty-below-k contract —
    the property the oracle SQL relies on."""
    from pyspark.sql import functions as F

    from dataframe_expressions_spark.functions.dedup import (
        token_hash_shingles,
        word_shingles,
    )

    rows = [
        ([],),
        (["a"],),
        (["a", "b"],),
        (["a", "b", "c"],),                     # exactly k=3
        (["a", "b", "c", "d", "e"],),
        (["x", "x", "x", "x"],),                # one distinct shingle
        (["a", "b", "a", "b", "a", "b"],),      # repeating pattern
        ([str(i % 7) for i in range(40)],),     # long with repeats
    ]
    df = spark.createDataFrame(rows, "toks array<string>")
    th = df.select(
        F.col("toks"),
        F.transform(F.col("toks"), lambda t: F.xxhash64(t)).alias("th"),
    )
    for k in (2, 3, 5):
        got = th.select(
            F.size(token_hash_shingles(F.col("th"), k)).alias("h"),
            F.size(word_shingles(F.col("toks"), k)).alias("s"),
        ).collect()
        for r in got:
            assert r["h"] == r["s"], (k, r)


def test_minhash_band_derivation_recall_floor():
    """Threshold-aware banding (r7): the derived (bands, rows) must keep
    the miss probability at s = threshold under 1e-6 while spending the
    FEWEST bands (bands beyond the floor are pure candidate cost)."""
    import math

    from dataframe_expressions_spark.functions.dedup import (
        minhash_near_dup_pairs,  # noqa: F401  (derivation logic inline)
    )

    def derive(threshold, n_hashes=32):
        for r in (4, 2, 1):
            p = threshold ** r
            b = math.ceil(math.log(1e-6) / math.log(1 - p))
            if b <= n_hashes // r:
                return b, r
        return n_hashes, 1

    for t, want in ((0.5, (20, 1)), (0.8, (14, 2)), (0.9, (9, 2))):
        b, r = derive(t)
        assert (b, r) == want, (t, b, r)
        assert (1 - t ** r) ** b <= 1e-6
        # minimality: one fewer band would break the floor
        assert (1 - t ** r) ** (b - 1) > 1e-6


def test_multimodal_strict_bmp_decodes_real_dims(spark):
    """Round-9: strict mode is no longer a pure stub — a real BMP payload
    decodes its REAL width/height from real header bytes through the
    full mapInPandas/Arrow path (multi-partition), while non-BMP
    payloads keep raising NotImplementedError.  Covers both DIB header
    families and the top-down (negative height) encoding."""
    import struct

    rows = [
        (1, MM.make_bmp(16, 9)),
        (2, MM.make_bmp(640, 480, seed=7)),
        (3, MM.make_bmp(1, 1)),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, img_bytes binary"
    ).repartition(3)
    got = {r.doc_id: r for r in MM.decode_meta(media, strict=True).collect()}
    assert (got[1].width, got[1].height) == (16, 9)
    assert (got[2].width, got[2].height) == (640, 480)
    assert (got[3].width, got[3].height) == (1, 1)
    assert got[2].n_bytes == len(rows[1][1])

    # header-level unit coverage: top-down BMP (negative height) and the
    # legacy BITMAPCOREHEADER
    td = bytearray(MM.make_bmp(8, 4))
    struct.pack_into("<i", td, 22, -4)
    assert MM.bmp_dims(bytes(td)) == (8, 4)
    core = b"BM" + struct.pack("<IHHI", 14 + 12, 0, 0, 26) + struct.pack(
        "<IHHHH", 12, 320, 200, 1, 24
    )
    assert MM.bmp_dims(core) == (320, 200)

    # non-BMP/non-WAV payloads still raise through the Arrow boundary
    bad = spark.createDataFrame(
        [(9, b"not an image")], "doc_id long, img_bytes binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|libav"):
        MM.decode_meta(bad, strict=True).collect()

    # corrupt headers reject loudly instead of emitting a negative-width
    # row (round-10 ADVICE: negative int32 width passed through abs-free)
    neg_w = bytearray(MM.make_bmp(8, 4))
    struct.pack_into("<i", neg_w, 18, -8)
    with pytest.raises(ValueError, match="malformed BMP"):
        MM.bmp_dims(bytes(neg_w))
    zero_h = bytearray(MM.make_bmp(8, 4))
    struct.pack_into("<i", zero_h, 22, 0)
    with pytest.raises(ValueError, match="malformed BMP"):
        MM.bmp_dims(bytes(zero_h))


def test_multimodal_strict_wav_decodes_real_audio_meta(spark):
    """Round-10: the strict decoder's second real codec — RIFF/WAVE
    headers decode REAL sample rate / channels / duration from real
    bytes, dispatched by magic alongside BMP in ONE mapInPandas pass
    (mixed image+audio batch), with per-kind fields NULLed."""
    import struct

    rows = [
        (1, MM.make_wav(sample_rate=16000, channels=2, n_samples=8000)),
        (2, MM.make_wav(sample_rate=8000, channels=1, n_samples=12000)),
        (3, MM.make_bmp(32, 8)),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, img_bytes binary"
    ).repartition(3)
    got = {r.doc_id: r for r in MM.decode_meta(media, strict=True).collect()}
    assert got[1].kind == "audio" and got[1].width is None
    assert (got[1].sample_rate, got[1].channels) == (16000, 2)
    assert got[1].duration_ms == 500  # 8000 frames / 16 kHz
    assert (got[2].sample_rate, got[2].channels, got[2].duration_ms) == (
        8000, 1, 1500,
    )
    assert got[3].kind == "image" and got[3].sample_rate is None
    assert (got[3].width, got[3].height) == (32, 8)

    # header-level unit coverage: chunk walking skips unknown chunks
    # (word-aligned), malformed WAVs reject loudly
    wav = MM.make_wav(sample_rate=44100, channels=2, n_samples=441)
    # splice an odd-sized junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = wav[:12] + junk + wav[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    assert MM.wav_meta(spliced) == (44100, 2, 441, 10)
    with pytest.raises(NotImplementedError, match="libav"):
        MM.wav_meta(b"ID3\x03mp3-ish payload")
    with pytest.raises(ValueError, match="missing fmt/data"):
        MM.wav_meta(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    broken = bytearray(MM.make_wav())
    struct.pack_into("<H", broken, 22, 0)  # zero channels
    with pytest.raises(ValueError, match="malformed WAV"):
        MM.wav_meta(bytes(broken))
    # round-10 ADVICE: a data chunk whose declared size overruns the
    # buffer is a TRUNCATED payload — loud rejection, not a silent
    # clamp-and-compute (consistent with bmp_dims / the container walker)
    whole = MM.make_wav(n_samples=64)
    with pytest.raises(ValueError, match="truncat|remain"):
        MM.wav_meta(whole[:-10])


def test_multimodal_strict_frame_sample_real_container(spark):
    """Round-10: the strict frame sampler demuxes a REAL multi-frame
    container (concatenated self-sized BMP frames — the public-format
    analogue of a video container) and emits every Nth WHOLE frame,
    each independently decodable; corrupt containers reject loudly."""
    frames = [MM.make_bmp(4 + i, 2 + i, seed=i) for i in range(5)]
    container = MM.make_bmp_container(frames)
    media = spark.createDataFrame(
        [(7, container)], "doc_id long, img_bytes binary"
    )
    out = sorted(
        MM.frame_sample(media, every=2, strict=True).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 2, 4]
    # offsets are the true byte boundaries and each sampled frame is a
    # complete, decodable BMP with the right dimensions
    sizes = [len(f) for f in frames]
    assert [r.frame_off for r in out] == [0, sizes[0] + sizes[1],
                                          sum(sizes[:4])]
    for r in out:
        assert MM.bmp_dims(bytes(r.frame_bytes)) == (
            4 + r.frame_idx, 2 + r.frame_idx,
        )
    # non-container payloads raise through the Arrow boundary...
    bad = spark.createDataFrame(
        [(9, b"mpeg-ish payload")], "doc_id long, img_bytes binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|libav"):
        MM.frame_sample(bad, strict=True).collect()
    # ...and a truncated final frame is a loud ValueError, not a short read
    with pytest.raises(Exception, match="corrupt container"):
        MM.frame_sample(
            spark.createDataFrame(
                [(8, container[:-10])], "doc_id long, img_bytes binary"
            ),
            strict=True,
        ).collect()
    # the oracle-checked default path is byte-stable: stride slicing
    deflt = MM.frame_sample(media, every=256).collect()
    assert all(len(r.frame_bytes) <= 16 for r in deflt)
    assert len(deflt) == (len(container) + 255) // 256


def test_store_root_configurable(spark, tmp_path, monkeypatch):
    """Round-9: the write-once store root is $SPARK_GRAFT_STORE_ROOT (an
    object-store prefix on a real cluster; see sources.tables.store_root
    for the s3a/abfss layout and the atomic-rename caveat), not a
    hard-coded /tmp — a non-default root must receive the built artifact
    and serve the read-back."""
    from conftest import SF_SMOKE

    from dataframe_expressions_spark.sources.tables import (
        orders_nested,
        store_root,
    )

    monkeypatch.setenv("SPARK_GRAFT_STORE_ROOT", str(tmp_path))
    assert store_root() == str(tmp_path)
    df = orders_nested(spark, SF_SMOKE)
    assert df.count() > 0
    built = list(tmp_path.glob("spark_graft_view_orders_nested_*"))
    assert built, f"store not built under custom root: {list(tmp_path.iterdir())}"
    # second call is a no-op read-through of the same store
    assert orders_nested(spark, SF_SMOKE).count() == df.count()
