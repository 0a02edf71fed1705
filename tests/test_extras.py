"""Training-data pipeline extras: text analysis, n-gram Jaccard dedup,
embedding similarity, multimodal plumbing — with DuckDB cross-checks where
the op is SQL-expressible (pre-verifying the driver's oracle protocol)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from cpdd_spark.ngram import jaccard_pairs
from cpdd_spark.signatures import exact_jaccard_sets
from cpdd_spark.similarity import (
    cosine_dup_pairs,
    cosine_dup_pairs_lsh,
    cosine_topk,
    lsh_topk,
)
from cpdd_spark.textfuncs import profile

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_textfuncs_profile(spark, docs):
    pdf = profile(docs).toPandas()
    for _, r in pdf.head(50).iterrows():
        toks = r["text"].split(" ") if r["text"] else []
        assert r["n_tokens"] == len(toks)
        assert r["n_punct"] == sum(r["text"].count(c) for c in ".,!?")
        assert 0.0 <= r["quality"] <= 1.0
        assert r["lang_pred"] in ("en", "unknown", "short")
    assert (pdf["fingerprint"].str.len() == 32).all()


def test_token_count_matches_duckdb(spark, docs):
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in profile(docs).select("doc_id", "n_tokens").collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.execute(
            f"select doc_id, case when length(text)=0 then 0 else len(string_split(text,' ')) end"
            f" from read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    assert got == exp


def test_ngram_jaccard_matches_bruteforce(spark, docs):
    sample = docs.filter("doc_id < 120")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(sample, "doc_id", "text", n=3, tau=0.2).collect()
    }
    rows = sample.select("doc_id", "text").collect()
    import itertools

    exp = {}
    for (ia, ta), (ib, tb) in itertools.combinations(
        sorted((r["doc_id"], r["text"]) for r in rows), 2
    ):
        j = exact_jaccard_sets(ta, tb, 3)
        # exact_jaccard_sets treats sub-w docs specially; jaccard_pairs
        # simply has no grams for them — mirror that here
        if len(ta.split()) >= 3 and len(tb.split()) >= 3 and j >= 0.2:
            exp[(ia, ib)] = j
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12


def test_ngram_short_docs_dont_crash(spark):
    """Regression: F.sequence(0, size-n) counts DOWN for sub-n-token docs and
    F.slice threw INVALID_PARAMETER_VALUE.START — 1-token docs crashed every
    query routed through jaccard_pairs."""
    df = spark.createDataFrame(
        [("d0", "one"), ("d1", ""), ("d2", "a b"), ("d3", "w x y z q r s t"),
         ("d4", "w x y z q r s t")],
        "id string, text string",
    )
    got = {(r["a"], r["b"]) for r in jaccard_pairs(df, "id", "text", n=5).collect()}
    assert got == {("d3", "d4")}


def test_ngram_posting_cap_bounds_join(spark):
    """max_doc_freq drops over-cap postings: a shingle shared by all docs
    stops generating pairs, while rare-shingle pairs survive with their TRUE
    (full-denominator) Jaccard."""
    boiler = "alpha beta gamma delta epsilon"
    rare = "zeta eta theta iota kappa"
    rows = [(f"b{i}", boiler) for i in range(30)] + [
        ("r1", rare), ("r2", rare)
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    # uncapped: 30 boilerplate docs -> C(30,2)=435 pairs + the rare pair
    assert jaccard_pairs(df, "id", "text", n=5, tau=0.5).count() == 436
    capped = jaccard_pairs(df, "id", "text", n=5, tau=0.5, max_doc_freq=10)
    got = {(r["a"], r["b"]): r["jaccard"] for r in capped.collect()}
    assert got == {("r1", "r2"): 1.0}


def test_cosine_topk_self_consistent(spark, embs):
    queries = embs.filter("vec_id < 5")
    got = cosine_topk(embs, queries, k=3).collect()
    assert len(got) == 15
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    pdf = embs.toPandas()
    M = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q, rows in by_q.items():
        qi = np.where(ids == q)[0][0]
        sims = Mn @ Mn[qi]
        sims[qi] = -np.inf
        top = ids[np.argsort(-sims)[:3]]
        assert [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])] == list(top)


def test_cosine_dup_pairs_symmetric_threshold(spark, embs):
    pairs = cosine_dup_pairs(embs.filter("vec_id < 100"), threshold=0.8).collect()
    for r in pairs:
        assert r["a"] < r["b"]
        assert r["cosine"] >= 0.8


def test_lsh_topk_recall(spark, embs):
    """Bucketed ANN recall@3 vs brute force. This corpus's true top-3
    neighbors sit at cosine ~0.34 (near-random vectors), so per-plane
    collision p ~ 0.61 and 4 planes x 12 tables gives expected recall
    ~0.83; assert a 0.6 floor (seeded, so stable)."""
    queries = embs.filter("vec_id < 20")
    exact = cosine_topk(embs, queries, k=3).collect()
    approx = lsh_topk(embs, queries, dim=64, k=3, n_planes=4, n_tables=12).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(e & a) / len(e) >= 0.6


def test_cosine_dup_pairs_lsh_matches_bruteforce(spark):
    """Planted near-dup embeddings: the bucketed path must find exactly the
    brute-force pair set (planted pairs sit at cosine ~0.97+, where the
    multi-table miss probability is ~1e-20 — and the seeded sketches make
    the run deterministic either way)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 64)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(60)]
    # plant 10 near-dups: vector i+100 = vector i + small noise
    for i in range(10):
        noisy = base[i] + rng.normal(scale=0.05, size=64).astype(np.float32)
        rows.append((i + 100, noisy.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = {
        (r["a"], r["b"]): r["cosine"]
        for r in cosine_dup_pairs(df, threshold=0.9).collect()
    }
    lsh = {
        (r["a"], r["b"]): r["cosine"]
        for r in cosine_dup_pairs_lsh(df, threshold=0.9, dim=64).collect()
    }
    assert len(brute) >= 10
    assert lsh == brute


def test_embed_dup_pairs_plan_has_no_cartesian(spark):
    """The driver's embed_dup_pairs must never cross-join the corpus."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["embed_dup_pairs"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_multimodal_plumbing(spark, docs):
    from cpdd_spark.codecs import CodecError, encode_png
    from cpdd_spark.multimodal import (
        attach_payload,
        decode_image,
        extract_features,
        frame_sample,
        text_to_image_media,
    )

    # REAL containers: text renders into genuine PNG/BMP payloads whose
    # decoded-pixel histograms come back through the real codec path
    media = text_to_image_media(docs.limit(50), "doc_id", "text")
    feats = extract_features(media).collect()
    assert len(feats) == 50
    assert {r["format"] for r in feats} == {
        "png", "bmp", "pgm", "jpeg", "gif", "webp",
    }
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3
        assert r["width"] == 32 and r["height"] >= 1 and r["channels"] in (1, 3)

    # non-image payloads (raw text bytes) sniff unknown -> NULL features
    raw = attach_payload(docs.limit(5), "doc_id", "text")
    for r in extract_features(raw).collect():
        assert r["format"] == "unknown" and r["features"] is None

    # undecodable format raises; corrupt PNG raises CodecError, and
    # strict=False absorbs both to nulls (tested above) while
    # strict=True propagates
    with pytest.raises(CodecError):
        # lossy VP8 WebP refuses loudly (only lossless VP8L decodes)
        decode_image(b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"\x00" * 16)
    # jpeg/gif decode for real now; malformed ones raise CodecError
    with pytest.raises(CodecError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(CodecError):
        decode_image(b"GIF89a" + b"\x00" * 16)
    good = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF
    with pytest.raises(CodecError):
        decode_image(bytes(corrupt))
    import pyspark.errors

    bad_media = spark.createDataFrame(
        [("x", bytes(corrupt))], "media_id string, payload binary"
    )
    with pytest.raises(pyspark.errors.PySparkException):
        extract_features(bad_media, strict=True).collect()

    frames = frame_sample(media, every_n=64, max_frames=4)
    fr = frames.collect()
    assert all(f["frame_idx"] < 4 for f in fr)

    # frames must be the payload's ACTUAL bytes (a binary->string cast
    # would mangle every non-UTF-8 byte to U+FFFD): check byte-for-byte
    # against Python slicing on real PNG payloads, which are guaranteed
    # non-UTF-8 (zlib streams)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert fr, "no frames sampled"
    for f in fr:
        expect = payloads[f["media_id"]][f["frame_idx"] * 64 : f["frame_idx"] * 64 + 64]
        assert bytes(f["frame"]) == expect


def test_audio_plumbing(spark, docs):
    """Audio modality twin of test_multimodal_plumbing: text renders
    into genuine PCM16 WAV containers, and the feature kernel's decoded
    numbers match an independent numpy computation on the same bytes."""
    from cpdd_spark.multimodal import (
        audio_features,
        attach_payload,
        text_to_audio_media,
    )
    from cpdd_spark.wav import decode_wav

    media = text_to_audio_media(docs.limit(30), "doc_id", "text")
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = audio_features(media).collect()
    assert len(out) == 30
    for r in out:
        assert r["format"] == "wav"
        samples, rate = decode_wav(payloads[r["media_id"]])
        n, ch = samples.shape
        assert (r["sample_rate"], r["n_samples"], r["n_channels"]) == (rate, n, ch)
        # independent recomputation of the decoded-sample features
        x = samples[:, 0].astype(np.float64)
        rms = float(np.sqrt((x * x).mean()) / 32768.0)
        assert abs(r["rms"] - rms) < 1e-12
        signs = samples >= 0
        zcr = float((signs[1:] != signs[:-1]).sum() / max(1, (n - 1) * ch))
        assert r["zero_cross_rate"] == zcr
        mag = np.abs(np.fft.rfft(x))
        if mag.sum() > 0:
            cent = float((np.fft.rfftfreq(n, 1.0 / rate) * mag).sum() / mag.sum())
            assert abs(r["spectral_centroid_hz"] - cent) < 1e-9
        # the rendered signal is the document's bytes: samples recover them
        assert (samples[:, 0] >> 8).astype(np.int16).min() >= -128

    # non-WAV payloads (raw text bytes) -> NULL features, loud in strict
    raw = attach_payload(docs.limit(5), "doc_id", "text", kind="audio")
    for r in audio_features(raw).collect():
        assert r["format"] == "unknown" and r["rms"] is None
    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        audio_features(raw, strict=True).collect()


def test_repetition_and_token_freq(spark):
    """Hand-computable repetition fractions + vocabulary counting with a
    deterministic tie-broken top-k cut."""
    from cpdd_spark.textfuncs import ngram_repetition, token_frequencies, ws_tokens

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # bigrams: ab,ba,ab,ba,ab -> 5 total 2 distinct
            (2, "all tokens differ completely here"),  # no repeats
            (3, "x"),                  # sub-bigram -> 0.0 by convention
            (4, "w w w w"),            # bigrams all 'w w' -> 2/3; trigrams 'w w w' -> 1/2
        ],
        "doc_id long, text string",
    )
    toks = df.select("doc_id", ws_tokens(F.col("text")).alias("__t"))
    t = F.col("__t")
    out = {
        r["doc_id"]: r
        for r in toks.select(
            "doc_id",
            ngram_repetition(t, 2).alias("b"),
            ngram_repetition(t, 3).alias("g"),
        ).collect()
    }
    assert out[1]["b"] == (5 - 2) / 5
    assert out[2]["b"] == 0.0 and out[2]["g"] == 0.0
    assert out[3]["b"] == 0.0
    assert out[4]["b"] == (3 - 1) / 3 and out[4]["g"] == (2 - 1) / 2

    freqs = token_frequencies(df, "text").collect()
    by_tok = {r["token"]: r["n"] for r in freqs}
    assert by_tok["a"] == 3 and by_tok["b"] == 3 and by_tok["w"] == 4
    # top-k cut: ties (a==b==3) break on token string, so k=2 keeps w, a
    top2 = [r["token"] for r in token_frequencies(df, "text", top_k=2).collect()]
    assert top2 == ["w", "a"]


def test_decontaminate_planted_overlap(spark):
    """Planted benchmark leakage: a corpus doc quoting a probe sentence
    verbatim is flagged with the exact shared-gram count; paraphrases
    sharing no 5-gram stay clean; sub-5-token docs report 0 by
    convention; the shuffle-join fallback matches the broadcast plan."""
    from cpdd_spark.ngram import decontaminate

    probes = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "benchmarks must never leak into the training corpus"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # quotes probe 100's first 6 tokens -> two distinct 5-grams
            (1, "she said the quick brown fox jumps over and left"),
            # same words, reordered: no shared 5-gram
            (2, "fox brown quick the dog lazy over jumps tonight"),
            (3, "too short"),
            (4, "completely unrelated text about parquet partition pruning strategies"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, probes, "doc_id", "text").collect()
    }
    assert len(out) == 4
    assert out[1]["n_hits"] == 2 and out[1]["contaminated"]
    for clean in (2, 3, 4):
        assert out[clean]["n_hits"] == 0 and not out[clean]["contaminated"]

    # min_overlap raises the bar: 2 shared grams < 3 -> clean
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            corpus, probes, "doc_id", "text", min_overlap=3
        ).collect()
    }
    assert not strict[1]

    # shuffle-join fallback: identical result rows
    fallback = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(
            corpus, probes, "doc_id", "text", broadcast_probes=False
        ).collect()
    }
    assert fallback == {
        k: (r["n_hits"], r["contaminated"]) for k, r in out.items()
    }

    # probe self-hit sanity: running the corpus = probes marks everything
    selfscan = decontaminate(probes, probes, "doc_id", "text").collect()
    assert all(r["contaminated"] for r in selfscan)


def test_ivf_topk_finds_planted_neighbors(spark):
    """IVF-Flat on planted near-duplicates (cosine ~0.99): base vectors
    plus tiny noise must retrieve each other as top-1 through the
    cell-probe path (near-identical vectors quantize to the same or an
    adjacent probed cell)."""
    from cpdd_spark.similarity import ivf_topk

    rng = np.random.default_rng(5)
    base = rng.normal(size=(80, 64))
    rows = []
    for i in range(80):
        rows.append((i, base[i].tolist()))
        rows.append((1000 + i, (base[i] + rng.normal(scale=0.02, size=64)).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = ivf_topk(
        corpus, corpus.filter("vec_id < 80"), dim=64, k=1,
        n_centroids=16, n_probe=4,
    ).collect()
    hits = sum(1 for r in got if r["neighbor_id"] == r["query_id"] + 1000)
    assert hits / 80 >= 0.9, f"planted recall {hits/80}"


def test_ivf_topk_deterministic(spark, embs):
    """Seeded sampling + k-means + argmax assignment: two invocations are
    row-identical (the property q_ivf_recall's pinned oracle rests on)."""
    from cpdd_spark.similarity import ivf_topk

    q = embs.filter("vec_id < 10")
    a = sorted(map(tuple, ivf_topk(embs, q, dim=64, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(embs, q, dim=64, k=3).collect()))
    assert a == b


def test_ivf_centroids_deterministic_and_normalized(spark, embs):
    from cpdd_spark.similarity import ivf_centroids

    c1 = ivf_centroids(embs, dim=64, n_centroids=8, iters=3)
    c2 = ivf_centroids(embs, dim=64, n_centroids=8, iters=3)
    assert (c1 == c2).all()
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_multimodal_format_sniff_and_entropy(spark):
    """The byte-level multimodal features are REAL (no codec): magic-byte
    container detection (JVM expression and Arrow kernel must agree) and
    Shannon entropy with its analytic anchors."""
    from cpdd_spark.multimodal import byte_entropy, extract_features, format_col

    from cpdd_spark.codecs import encode_bmp

    payloads = [
        ("jpg", b"\xff\xd8\xff\xe0" + b"\x00" * 32, "jpeg"),
        ("png", b"\x89PNG\r\n\x1a\n" + b"\x00" * 32, "png"),
        ("wav", b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 24, "wav"),
        ("webp", b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"\x00" * 24, "webp"),
        ("mkv", b"\x1a\x45\xdf\xa3" + b"\x00" * 32, "matroska"),
        ("mp3", b"ID3\x04" + b"\x00" * 32, "mp3"),
        ("txt", b"hello plain text", "unknown"),
        ("gif", b"GIF89a" + b"\x00" * 16, "gif"),
        ("bmp", encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)), "bmp"),
    ]
    from pyspark.sql import functions as F

    media = spark.createDataFrame(
        [(k, p) for k, p, _ in payloads], "media_id string, payload binary"
    )
    # JVM expression path
    jvm = {
        r["media_id"]: r["fmt"]
        for r in media.select("media_id", format_col(F.col("payload")).alias("fmt")).collect()
    }
    # Arrow kernel path (inside extract_features)
    kern = {
        r["media_id"]: r["format"]
        for r in extract_features(media).collect()
    }
    for k, _, want in payloads:
        assert jvm[k] == want, (k, jvm[k])
        assert kern[k] == want, (k, kern[k])

    # entropy anchors: constant bytes -> 0; uniform 0..255 -> exactly 8
    assert byte_entropy(b"\x00" * 1024) == 0.0
    assert abs(byte_entropy(bytes(range(256)) * 4) - 8.0) < 1e-12
    ent = {
        r["media_id"]: r["entropy"]
        for r in extract_features(media).collect()
    }
    assert ent["jpg"] < 2.0  # zero-padded header: low entropy


def test_ivf_sample_job_has_no_driver_merge(spark, embs):
    """Round-3 verdict 'What's wrong #2': the IVF training sample must be
    a hash-filtered gather, never a global TakeOrderedAndProject (which
    merges num_partitions x max_sample embedding rows on the driver)."""
    import numpy as np

    from cpdd_spark.similarity import ivf_centroids, ivf_sample_df

    plan = (
        ivf_sample_df(embs, 16, "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" not in plan
    # the adaptive-mod + driver-sort path selects the SAME sample as the
    # old orderBy().limit() wherever that limit never truncated — the
    # pinned ivf_recall oracle rests on this staying deterministic
    c1 = ivf_centroids(embs, dim=64, n_centroids=8, iters=3)
    c2 = ivf_centroids(embs, dim=64, n_centroids=8, iters=3)
    assert (c1 == c2).all()


def test_hash_split_deterministic_and_partition_invariant(spark):
    """hash_split: pure function of the id — identical assignment across
    reruns and repartitionings, fractions validated, masses near the
    requested split."""
    import pytest as _pytest

    from cpdd_spark.sampling import hash_split

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", fr).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(17), "doc_id", fr).collect()
    }
    assert a == b
    n = len(a)
    masses = {s: sum(1 for v in a.values() if v == s) / n for s in fr}
    assert abs(masses["train"] - 0.9) < 0.03
    assert abs(masses["val"] - 0.05) < 0.02
    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5, "val": 0.2}).collect()


def test_stratified_sample_consistent_with_late_arrivals(spark):
    """The property sampleBy lacks: sampling a PREFIX of the data then the
    rest yields exactly the union of sampling everything at once — late
    shards sample consistently with the already-processed corpus."""
    from cpdd_spark.sampling import stratified_sample

    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("other").alias("lang"),
    )
    rates = {"en": 0.5}
    whole = {r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", rates, 0.1).collect()}
    first = {r["doc_id"] for r in stratified_sample(df.filter("doc_id < 1200"), "doc_id", "lang", rates, 0.1).collect()}
    rest = {r["doc_id"] for r in stratified_sample(df.filter("doc_id >= 1200"), "doc_id", "lang", rates, 0.1).collect()}
    assert first | rest == whole and not (first & rest)
    # rates actually differ per stratum
    langs = {r["doc_id"]: r["lang"] for r in df.collect()}
    en = [d for d in whole if langs[d] == "en"]
    other = [d for d in whole if langs[d] == "other"]
    assert len(en) / (2000 / 3) > 0.4 and len(other) / (2000 * 2 / 3) < 0.2


def test_multimodal_resize_and_pool_plumbing(spark):
    """resize_media: REAL decode -> nearest-neighbor resample -> PNG
    re-encode over genuine containers; avg_pool_features: pure-JVM pooling
    matches numpy."""
    import numpy as np

    import pytest as _pytest

    from cpdd_spark.codecs import CodecError, decode_png
    from cpdd_spark.multimodal import (
        avg_pool_features,
        extract_features,
        resize_image,
        resize_media,
        text_to_image_media,
    )

    docs = spark.createDataFrame(
        [(1, "hello world " * 40), (2, "xyz")], "doc_id long, text string"
    )
    media = text_to_image_media(docs, "doc_id", "text")
    out = resize_media(media, width=8, height=4).collect()
    for r in out:
        arr = decode_png(bytes(r["payload"]))  # output is a REAL PNG
        assert arr.shape[:2] == (4, 8)
        assert (r["meta"]["width"], r["meta"]["height"]) == (8, 4)
    with _pytest.raises(CodecError):
        # lossy VP8 WebP refuses loudly; lossless VP8L resizes for real
        resize_image(b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"\x00" * 8, 2, 2)
    from cpdd_spark.webp import encode_webp

    wp = resize_image(
        encode_webp(np.arange(96, dtype=np.uint8).reshape(8, 12)), 6, 4
    )
    assert decode_png(wp).shape[:2] == (4, 6)
    with _pytest.raises(CodecError):
        resize_image(b"\xff\xd8\xff\xe0" + b"\x00" * 8, 2, 2)  # malformed jpeg
    with _pytest.raises(CodecError):
        resize_image(b"GIF89a" + b"\x00" * 8, 2, 2)  # malformed gif

    # resize agrees with the standalone kernel: decode -> resample ->
    # re-encode of the same source payload is byte-identical
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out:
        assert bytes(r["payload"]) == resize_image(src[r["media_id"]], 8, 4)

    feats = extract_features(media)
    pooled = {r["media_id"]: r["pooled"] for r in avg_pool_features(feats).collect()}
    raw = {r["media_id"]: np.array(r["features"]) for r in feats.collect()}
    for mid, p in pooled.items():
        expect = raw[mid].reshape(-1, 4).mean(axis=1)
        assert np.allclose(np.array(p), expect, atol=1e-6), mid
    # JVM-only pooling: no Python stage beyond the feature kernel itself
    plan = avg_pool_features(
        feats.localCheckpoint(eager=True)
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in plan

    # empty feature vector pools to an EMPTY array, not [null, null]
    # (sequence(0, -1) descends in Spark; the guard diverts it)
    empty = spark.createDataFrame(
        [("e", [])], "media_id string, features array<float>"
    )
    assert avg_pool_features(empty).collect()[0]["pooled"] == []
