"""Unit tests for the text / dedup / similarity / multimodal layers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_trading_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture
def docs(spark):
    rows = [
        (0, "The cat sat on the mat. The cat sat!", "en", "s0", 36),
        (1, "the cat sat on the mat the cat sat", "en", "s0", 34),  # exact dup of 0 after normalize
        (2, "der hund und die katze und der hund und die maus", "de", "s1", 48),
        (3, "completely different words entirely here banana", "en", "s2", 47),
        (4, "the cat sat on the mat the cat sat extra tail words here", "en", "s0", 57),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_normalize_and_tokens(spark):
    df = spark.range(1).select(
        text.normalize_text(F.lit("  Hello, WORLD!!  42x ")).alias("n"),
        text.token_count(F.lit("a b  c,d")).alias("c"),
    )
    row = df.collect()[0]
    assert row["n"] == "hello world 42x"
    assert row["c"] == 4


def test_language_id(docs):
    got = {r["doc_id"]: r["g"] for r in docs.select("doc_id", text.language_id("text").alias("g")).collect()}
    assert got[0] == "en"
    assert got[2] == "de"
    assert got[3] == "unknown"


def test_language_id_zh_cjk_ratio(spark):
    rows = [
        (0, "你好世界这是一个中文句子用来测试语言识别"),  # pure CJK -> zh
        (1, "mixed 你好 but the of to and in is you that mat"),  # ratio < 0.3 -> vote
        (2, "テキストのサンプルです"),  # pure kana, outside the Han block -> not zh
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["g"] for r in df.select("doc_id", text.language_id("text").alias("g")).collect()}
    assert got[0] == "zh"
    assert got[1] == "en"
    assert got[2] != "zh"
    ratios = {
        r["doc_id"]: r["c"] for r in df.select("doc_id", text.cjk_ratio("text").alias("c")).collect()
    }
    assert ratios[0] == 1.0 and 0.0 < ratios[1] < 0.3


def test_quality_score_bounds(docs):
    scores = [r["q"] for r in docs.select(text.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["keep_id"] == 0 and not by_id[0]["is_duplicate"]
    assert by_id[1]["keep_id"] == 0 and by_id[1]["is_duplicate"]
    assert by_id[1]["n_copies"] == 2
    assert by_id[3]["n_copies"] == 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found  # identical after normalization → jaccard 1.0
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == pytest.approx(1.0)
    # near-dup 0↔4 shares most shingles
    if (0, 4) in found:
        assert 0.2 <= jac[(0, 4)] < 1.0


def test_simhash_identical_and_blocking(docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found.get((0, 1)) == 0  # identical normalized text → identical sketch


def test_ngram_jaccard_pairs(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2, block_cols=("lang",)).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found.get((0, 1)) == pytest.approx(1.0)
    # cross-lang pairs are never compared (blocking)
    assert all(a != 2 and b != 2 for a, b in found)


def test_cosine_topk_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # identical to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.7, 0.7, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert ranked[0]["vec_id"] == 1 and ranked[0]["cosine_sim"] == pytest.approx(1.0)
    assert ranked[1]["vec_id"] == 3
    assert ranked[2]["vec_id"] == 2 and ranked[2]["cosine_sim"] == pytest.approx(0.0)


def test_similarity_plans_build_without_jobs(spark):
    """Plan construction must not run Spark jobs: planes/centroids ride
    as broadcast packs evaluated at action time.  A poison UDF on the
    embedding column raises if anything executes during build."""
    rows = [(i, [float(i % 3), 1.0, float(i % 5)]) for i in range(20)]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    @F.udf("array<float>")
    def poison(v):
        raise RuntimeError("plan-build executed the corpus")

    corpus = base.withColumn("embedding", poison("embedding"))
    queries = corpus.where(F.col("vec_id") < 2)
    # building these plans must not trigger execution
    lsh = similarity.srp_lsh_topk(corpus, queries, k=2, num_planes=2)
    ivf = similarity.ivf_topk(corpus, queries, k=2, n_cells=2, nprobe=1, centroid_method="lowest_id")
    pairs = similarity.embedding_cosine_pairs(corpus, threshold=0.5, num_planes=2)
    for plan in (lsh, ivf, pairs):
        with pytest.raises(Exception):
            plan.count()  # ...but executing them hits the poison UDF


def test_cosine_topk_guards_unbounded_corpus(spark):
    rows = [(i, [float(i), 1.0]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="srp_lsh_topk or ivf_topk"):
        similarity.cosine_topk(emb, q, k=3, max_corpus_rows=5)
    # explicit override disables the guard
    assert similarity.cosine_topk(emb, q, k=3, max_corpus_rows=None).count() == 3


def test_srp_lsh_recall_on_testdata(spark, sf_dir):
    from polars_trading_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, queries, k=3).collect()
    approx = similarity.srp_lsh_topk(emb, queries, k=3, num_planes=4).collect()
    # The approximate result must be a plausible ranking: every returned
    # neighbor must appear in the exact candidate universe and ranks are
    # contiguous from 1.
    for qid in {r["query_id"] for r in approx}:
        ranks = sorted(r["rank"] for r in approx if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))
    assert len(approx) > 0 and len(exact) > 0


def test_ivf_topk_recall_on_testdata(spark, sf_dir):
    from polars_trading_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, queries, k=3).collect()
    approx = similarity.ivf_topk(emb, queries, k=3, n_cells=8, nprobe=2).collect()
    for qid in {r["query_id"] for r in approx}:
        ranks = sorted(r["rank"] for r in approx if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))
    assert len(approx) > 0 and len(exact) > 0
    # Raising nprobe to every cell makes IVF exact — recall converges to 1.
    full = similarity.ivf_topk(emb, queries, k=3, n_cells=8, nprobe=8).collect()
    assert {(r["query_id"], r["rank"], r["vec_id"]) for r in full} == {
        (r["query_id"], r["rank"], r["vec_id"]) for r in exact
    }


def test_multimodal_metadata_and_frames(docs):
    media = multimodal.synthesize_media(docs)
    meta = multimodal.extract_media_metadata(media).collect()
    assert len(meta) == 5
    by_id = {r["media_id"]: r for r in meta}
    assert by_id[0]["media_type"] == "image" and by_id[0]["duration_ms"] == 0
    assert by_id[1]["media_type"] == "audio" and by_id[1]["width"] == 0
    assert by_id[2]["media_type"] == "video" and by_id[2]["width"] > 0
    assert all(len(r["checksum"]) == 32 for r in meta)

    frames = multimodal.sample_frames(media, every_ms=500).collect()
    assert len(frames) > 0
    assert all(r["offset_ms"] % 500 == 0 for r in frames)


def test_decode_image_garbage_and_pinned_jpeg_scope():
    # unrecognized container -> ValueError (not a stub any more)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"not an image")
    import struct

    # a header-only JPEG (no scan) is malformed, not unsupported
    m = 5
    w, h = 16 + m % 613, 16 + m % 377
    app0 = b"\xff\xe0" + struct.pack(">H5sHBHHBB", 16, b"JFIF\x00", 0x0102, 0, 72, 72, 0, 0)
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    # a 4:2:2-SUBSAMPLED 3-component frame is IN scope since round 10,
    # so a header-only stream is malformed, not unsupported
    sof_422 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + bytes(
        [1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_422 + b"\xff\xd9")
    # ... 4:1:1 is IN scope since round 11 (any integer-ratio
    # sampling): header-only means malformed, not unsupported
    sof_411 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + bytes(
        [1, 0x41, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_411 + b"\xff\xd9")
    # ... NON-INTEGER-RATIO sampling is IN scope since round 13
    # (nearest index-map upsampling): header-only means malformed
    sof_3c_frac = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + bytes(
        [1, 0x31, 0, 2, 0x21, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_3c_frac + b"\xff\xd9")
    # a header-only GRAYSCALE stream is malformed, not unsupported
    sof_gray = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes(
        [1, 0x11, 0]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode_gray(b"\xff\xd8" + app0 + sof_gray + b"\xff\xd9")
    # ... and so are header-only 4:4:4 AND 4:2:0 streams (in scope now)
    sof_444 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_444 + b"\xff\xd9")
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9")
    # a 4-component 1x1 frame is IN scope since round 10 (CMYK);
    # header-only means malformed, not unsupported
    sof_cmyk = b"\xff\xc0" + struct.pack(">HBHHB", 20, 8, h, w, 4) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_cmyk + b"\xff\xd9")
    # ... SUBSAMPLED 4-component is IN scope since round 11 (any
    # integer-ratio sampling): header-only means malformed, not
    # unsupported
    sof_cmyk_sub = b"\xff\xc0" + struct.pack(">HBHHB", 20, 8, h, w, 4) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_cmyk_sub + b"\xff\xd9")
    # ... NON-INTEGER-RATIO 4-component sampling is IN scope since
    # round 13 (nearest index-map upsampling): header-only = malformed
    sof_cmyk_frac = b"\xff\xc0" + struct.pack(">HBHHB", 20, 8, h, w, 4) + bytes(
        [1, 0x31, 0, 2, 0x21, 1, 3, 0x11, 1, 4, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_cmyk_frac + b"\xff\xd9")
    # ... as does a 2-component frame, by count
    sof_2c = b"\xff\xc0" + struct.pack(">HBHHB", 14, 8, h, w, 2) + bytes(
        [1, 0x11, 0, 2, 0x11, 1]
    )
    with pytest.raises(NotImplementedError, match="2-component"):
        multimodal.jpeg_decode(b"\xff\xd8" + app0 + sof_2c + b"\xff\xd9")
    # YCCK (Adobe transform=2) is IN scope since round 11: a stream
    # that declares it but carries a truncated scan is malformed, not
    # unsupported (pixel-exact decode is covered in
    # tests/test_multimodal_animated.py)
    app14_ycck = (
        b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
        + struct.pack(">HHHB", 100, 0, 0, 2)
    )
    sos4 = b"\xff\xda" + struct.pack(">HB", 14, 4) + bytes(
        [1, 0x00, 2, 0x11, 3, 0x11, 4, 0x11, 0, 63, 0]
    )
    with pytest.raises(ValueError):
        multimodal.decode_image(
            b"\xff\xd8" + app14_ycck + app0 + sof_cmyk + sos4 + b"\xff\xd9"
        )


def test_jpeg_codec_dc_only_exact_and_ac_reference():
    from polars_trading_spark.functions.multimodal import (
        decode_image,
        jpeg_encode_gray,
    )

    w, h = 16, 24
    nb = (w // 8) * (h // 8)
    blocks = []
    for k in range(nb):
        blk = [0] * 64
        blk[0] = ((7 + 13 * k) % 64) - 32
        blocks.append(blk)
    fmt, ww, hh, px = decode_image(jpeg_encode_gray(blocks, w, h))
    assert (fmt, ww, hh) == ("jpeg", w, h)
    for by in range(h // 8):
        for bx in range(w // 8):
            k = by * (w // 8) + bx
            want = 2 * (((7 + 13 * k) % 64) - 32) + 128
            assert (px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0] == want).all()

    # AC spectra vs a textbook double-loop IDCT reference
    zz = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19,
          26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42,
          49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59,
          52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

    def ref_idct(blk):
        Fm = np.zeros((8, 8))
        for kk, pos in enumerate(zz):
            Fm[pos // 8, pos % 8] = blk[kk] * 16
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                        cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                        s += cu * cv * Fm[u, v] * np.cos(
                            (2 * y + 1) * u * np.pi / 16
                        ) * np.cos((2 * x + 1) * v * np.pi / 16)
                out[y, x] = s / 4
        return np.clip(np.rint(out + 128), 0, 255)

    rng = np.random.RandomState(11)
    blocks = []
    for k in range(nb):
        blk = [0] * 64
        blk[0] = int(rng.randint(-40, 40))
        for pos in rng.choice(range(1, 64), size=7, replace=False):
            blk[pos] = int(rng.randint(-15, 15))
        blocks.append(blk)
    _, _, _, px = decode_image(jpeg_encode_gray(blocks, w, h))
    for by in range(h // 8):
        for bx in range(w // 8):
            k = by * (w // 8) + bx
            got = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0].astype(float)
            assert np.abs(got - ref_idct(blocks[k])).max() <= 1, k

    # orientation: a lone horizontal-frequency coefficient varies along
    # x only (catches a transposed IDCT that round-trips would miss)
    blk = [0] * 64
    blk[1] = 10
    _, _, _, px = decode_image(jpeg_encode_gray([blk], 8, 8))
    g = px[:, :, 0].astype(int)
    assert (np.ptp(g, axis=1) > 0).all() and (np.ptp(g, axis=0) == 0).all()

    # ZRL (16-zero runs) and a coefficient on the last zig-zag index
    blk = [0] * 64
    blk[0], blk[40], blk[63] = 5, 7, -3
    _, _, _, px = decode_image(jpeg_encode_gray([blk], 8, 8))
    assert np.abs(px[:, :, 0].astype(float) - ref_idct(blk)).max() <= 1


def test_jpeg_color_codec_dc_only_exact_and_interleave():
    from polars_trading_spark.functions.multimodal import (
        decode_image,
        jpeg_encode_ycbcr,
    )

    m, w, h = 23, 16, 24
    nb = (w // 8) * (h // 8)
    mcus = []
    for k in range(nb):
        blks = []
        for a, b in ((1, 13), (2, 7), (3, 5)):
            blk = [0] * 64
            blk[0] = ((a * m + b * k) % 64) - 32
            blks.append(blk)
        mcus.append(tuple(blks))
    fmt, ww, hh, px = decode_image(jpeg_encode_ycbcr(mcus, w, h))
    assert (fmt, ww, hh) == ("jpeg", w, h)
    assert px.shape == (h, w, 3)
    for by in range(h // 8):
        for bx in range(w // 8):
            k = by * (w // 8) + bx
            y = 2 * ((m + 13 * k) % 64) + 64
            cb = 2 * ((2 * m + 7 * k) % 64) + 64
            cr = 2 * ((3 * m + 5 * k) % 64) + 64
            want = np.clip(
                [
                    np.floor(y + 1.402 * (cr - 128.0) + 0.5),
                    np.floor(
                        y
                        - 0.344136 * (cb - 128.0)
                        - 0.714136 * (cr - 128.0)
                        + 0.5
                    ),
                    np.floor(y + 1.772 * (cb - 128.0) + 0.5),
                ],
                0,
                255,
            )
            got = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :]
            assert (got == want[None, None, :]).all(), (k, got[0, 0], want)

    # interleaving: three DIFFERENT DC runs must land on their own
    # planes (a component mix-up would swap them); neutral chroma
    # (Cb = Cr = 128) must decode to gray R = G = B = Y
    mcus = []
    for k in range(nb):
        yb, cbb, crb = [0] * 64, [0] * 64, [0] * 64
        yb[0] = (11 * k) % 40 - 20
        mcus.append((yb, cbb, crb))
    _, _, _, px = decode_image(jpeg_encode_ycbcr(mcus, w, h))
    assert (px[:, :, 0] == px[:, :, 1]).all()
    assert (px[:, :, 1] == px[:, :, 2]).all()
    for by in range(h // 8):
        for bx in range(w // 8):
            k = by * (w // 8) + bx
            want = 2 * ((11 * k) % 40 - 20) + 128
            assert (
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0] == want
            ).all()


def test_png_codec_roundtrip_all_filters_and_color_types():
    rng = np.random.RandomState(7)
    for ct, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        px = rng.randint(0, 256, size=(17, 29, ch), dtype=np.uint8)
        blob = multimodal.png_encode(px, color_type=ct)
        assert multimodal.parse_image_header(blob) == ("png", 29, 17)
        assert np.array_equal(multimodal.png_decode(blob), px)
    # isolate each unfilter path with single-filter encodes
    for f in range(5):
        px = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
        assert np.array_equal(
            multimodal.png_decode(multimodal.png_encode(px, filters=[f])), px
        ), f"filter {f}"


def test_png_decode_rejects_corruption_and_exotics():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = bytearray(multimodal.png_encode(px))
    blob[40] ^= 0xFF  # flip a byte inside a CRC-protected chunk
    with pytest.raises(ValueError, match="CRC"):
        multimodal.png_decode(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        multimodal.png_decode(b"\x00" * 32)


def test_gif_lzw_codec_roundtrip_stress():
    from polars_trading_spark.functions.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    rng = np.random.RandomState(3)
    # random streams across sizes: forces code-width growth 5->12 and,
    # at 60k symbols, dictionary overflow + CLEAR reset mid-stream
    for n in (1, 2, 7, 100, 1000, 60000):
        seq = rng.randint(0, 16, size=n).tolist()
        assert _lzw_decode_gif(_lzw_encode_gif(seq, 4), 4, n) == seq, n
    # KwKwK (code == next_code) trigger: long runs of one symbol
    seq = [5] * 5000
    assert _lzw_decode_gif(_lzw_encode_gif(seq, 4), 4, 5000) == seq


def test_gif_encode_decode_full_file():
    from polars_trading_spark.functions.multimodal import (
        gif_encode,
        gif_palette,
    )

    for m in (0, 7, 123, 4567):
        w, h = 4 + m % 29, 3 + m % 17
        j = np.arange(w * h, dtype=np.int64)
        idx = ((m * 31 + j * 7) % 16).tolist()
        payload = gif_encode(idx, w, h)
        assert multimodal.parse_image_header(payload) == ("gif", w, h)
        fmt, ww, hh, px = multimodal.decode_image(payload)
        exp = np.array([gif_palette(k) for k in idx], dtype=np.uint8).reshape(
            h, w, 3
        )
        assert (fmt, ww, hh) == ("gif", w, h)
        assert np.array_equal(px, exp), m


def test_gif_decode_rejects_garbage_and_deinterlaces_flagged_stream():
    from polars_trading_spark.functions.multimodal import gif_decode, gif_encode

    with pytest.raises(ValueError):
        gif_decode(b"not a gif at all")
    # round 9: the interlace flag no longer rejects — flipping it on a
    # NON-reordered stream must reorder rows on decode (i.e. the flag is
    # honored, not ignored); 2x2 passes are rows [0, 1] -> identity is
    # too small, use height 5 where pass order is [0, 4, 2, 1, 3]
    ind = list(range(10)) + [15 - i for i in range(10)]
    payload = bytearray(gif_encode(ind, 4, 5))
    desc_at = payload.index(b"\x2c", 13)
    payload[desc_at + 9] |= 0x40
    plain = gif_decode(gif_encode(ind, 4, 5))
    flagged = gif_decode(bytes(payload))
    import numpy as np

    order = [0, 4, 2, 1, 3]
    assert np.array_equal(flagged[order], plain)


def test_bmp_decode_strips_padding_and_flips_rows():
    import struct

    m = 41
    w, h = 4 + m % 29, 3 + m % 17
    row_sz = (3 * w + 3) // 4 * 4
    px_sz = row_sz * h
    header = struct.pack("<2sIHHI", b"BM", 54 + px_sz, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, px_sz, 2835, 2835, 0, 0
    )
    j = np.arange(px_sz, dtype=np.int64)
    payload = header + ((m * 31 + j * 7) % 256).astype(np.uint8).tobytes()
    fmt, ww, hh, back = multimodal.decode_image(payload)
    assert (fmt, ww, hh) == ("bmp", w, h)
    exp = (
        ((m * 31 + j * 7) % 256)
        .astype(np.uint8)
        .reshape(h, row_sz)[:, : 3 * w][::-1]
        .reshape(h, w, 3)
    )
    assert np.array_equal(back, exp)


def test_png_pixel_stats_spark_roundtrip(spark):
    """End-to-end: synthesize real PNGs in one mapInPandas stage, decode
    them (inflate + unfilter) in another, and match the closed-form
    arithmetic expected values — the Spark twin of the registry oracle."""
    ids = [0, 1, 7, 28, 41, 123, 999, 4567, 29 * 17, 29 * 17 + 5]
    base = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    media = multimodal.synthesize_png(base)
    rows = {r["media_id"]: r for r in multimodal.png_pixel_stats(media).collect()}
    assert len(rows) == len(ids)
    for m, r in rows.items():
        w, h = 4 + m % 29, 3 + m % 17
        j = np.arange(w * h * 3, dtype=np.int64)
        b = (m * 31 + j * 7) % 256
        assert (r["format"], r["width"], r["height"]) == ("png", w, h)
        assert r["n_px_bytes"] == w * h * 3
        assert r["px_sum"] == int(b.sum())
        assert r["px_dot"] == int((b * (j % 251 + 1)).sum())


def test_dedup_recall_stats_sampled_contract(docs):
    """Sampled harness: full mode reproduces the unsampled arms; the
    sampled mode is a deterministic strict subset (nested salted-hash
    recipe) with recall in [0, 1]; bad fractions rejected."""
    full = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction=None,
    ).collect()[0]
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.2, block_cols=()).count()
    assert full["n_exact"] == exact
    assert 0 <= full["n_hit"] <= full["n_exact"]
    if full["n_exact"]:
        assert 0.0 <= full["recall"] <= 1.0

    s1 = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction=0.5,
    ).collect()[0]
    s2 = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction=0.5,
    ).collect()[0]
    assert tuple(s1) == tuple(s2)  # deterministic, no RNG state
    assert s1["n_exact"] <= full["n_exact"]

    # auto mode: fraction = min(1, target_docs / n) — a huge target is
    # exactly the full corpus, a matching target equals the same static
    # fraction (constant sampled-doc budget contract)
    a_full = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction="auto", target_docs=10**9,
    ).collect()[0]
    assert tuple(a_full) == tuple(full)
    n = docs.count()
    a_half = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction="auto", target_docs=max(1, n // 2),
    ).collect()[0]
    m_half = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction=max(1, n // 2) / n,
    ).collect()[0]
    assert tuple(a_half) == tuple(m_half)

    with pytest.raises(ValueError):
        dedup.dedup_recall_stats(docs, sample_fraction=0.0)
    with pytest.raises(ValueError):
        dedup.dedup_recall_stats(docs, sample_fraction=1.5)
    with pytest.raises(ValueError):
        dedup.dedup_recall_stats(
            docs, sample_fraction="auto", target_docs=0
        )


def test_release_persisted_clears_all_caches(docs):
    """Cache-ownership contract: tracked persists never outlive a
    release_persisted() call (VERDICT r1 'unpersist discipline')."""
    from pyspark import StorageLevel

    from polars_trading_spark._utils import (
        _TRACKED_PERSISTS,
        release_persisted,
    )

    release_persisted()  # clean slate for TRACKED persists
    assert _TRACKED_PERSISTS == []
    dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()
    dedup.simhash_pairs(docs, max_hamming=3).collect()
    dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    # assert on the TRACKED registry, not the JVM-wide persistent-RDD
    # count: earlier test modules may leave localCheckpoint RDDs whose
    # reclamation by the ContextCleaner is timing-dependent
    tracked = list(_TRACKED_PERSISTS)
    assert len(tracked) >= 3
    assert all(
        df.storageLevel != StorageLevel(False, False, False, False)
        for df in tracked
    )
    released = release_persisted()
    assert released >= 3
    assert _TRACKED_PERSISTS == []
    assert all(
        df.storageLevel == StorageLevel(False, False, False, False)
        for df in tracked
    )


def test_minhash_bands_must_divide_hashes(docs):
    with pytest.raises(ValueError, match="must divide"):
        dedup.minhash_lsh_pairs(docs, num_hashes=12, bands=5)


def test_ngram_prefix_filter_matches_naive(docs, spark):
    """The AllPairs prefix+length filters are exact: output must equal
    the naive all-pairs-within-block Jaccard join."""
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    rows = docs.select(
        "lang", "doc_id", text.word_ngrams(F.col("text"), 3).alias("g")
    ).collect()
    naive = {}
    for a in rows:
        for b in rows:
            if a["lang"] != b["lang"] or a["doc_id"] >= b["doc_id"]:
                continue
            ga, gb = set(a["g"]), set(b["g"])
            union = len(ga | gb)
            j = len(ga & gb) / union if union else 0.0
            if j >= 0.2:
                naive[(a["doc_id"], b["doc_id"])] = j
    assert set(got) == set(naive)
    for k in naive:
        assert got[k] == pytest.approx(naive[k])


def test_ivf_kmeans_centroids_beat_lowest_id_on_clustered_data(spark):
    """Sampled k-means centroids must recover cluster structure that
    id-ordered centroid picks miss (VERDICT r1 #9).  Adversarial but
    realistic id order: the lowest ids all come from one cluster (crawl
    order), so lowest_id centroids collapse into it while k-means on the
    sample finds every cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for i in range(400):
        c = centers[0] if i < 16 else centers[i % 8]
        v = c + 0.15 * rng.normal(size=16)
        vecs.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 48))
    k = 5
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.cosine_topk(emb, queries, k=k).collect()}

    def recall(method):
        ap = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                emb, queries, k=k, n_cells=8, nprobe=1, centroid_method=method
            ).collect()
        }
        return len(ap & exact) / len(exact)

    r_kmeans, r_lowest = recall("kmeans"), recall("lowest_id")
    assert r_kmeans >= r_lowest
    assert r_kmeans >= 0.9


def test_ivf_kmeans_recall_floor_on_testdata(spark, sf_dir):
    from polars_trading_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    k = 5
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.cosine_topk(emb, queries, k=k).collect()}
    ap = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(emb, queries, k=k, n_cells=8, nprobe=2).collect()
    }
    assert len(ap & exact) / len(exact) >= 0.5  # 2/8 cells probed


def test_connected_components_transitive_chain(spark):
    # a-b and b-c emitted, a-c never emitted: all three must cluster.
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], ["doc_id"])
    out = {r.doc_id: r for r in dedup.connected_components(pairs, nodes=nodes).collect()}
    assert {out[i].cluster_id for i in (1, 2, 3)} == {1}
    assert out[3].cluster_size == 3 and out[3].is_duplicate
    assert not out[1].is_duplicate
    assert out[10].cluster_id == out[11].cluster_id == 10
    # Singleton from nodes, absent from every pair: own cluster of 1.
    assert out[99].cluster_id == 99 and out[99].cluster_size == 1
    assert not out[99].is_duplicate


def test_connected_components_long_path_converges(spark):
    # Worst-case diameter: a 12-node path; min label must reach the end.
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], ["id_a", "id_b"])
    out = dedup.connected_components(pairs).collect()
    assert len(out) == 13
    assert all(r.cluster_id == 0 for r in out)
    assert all(r.cluster_size == 13 for r in out)


def test_corpus_filter_gates_and_dedup(docs):
    from polars_trading_spark.functions import corpus

    out = {
        r.doc_id: r
        for r in corpus.corpus_filter(
            docs, langs=("en", "de"), min_tokens=1, max_tokens=100, min_quality=0.0
        ).collect()
    }
    # 0/1 are exact dups (same normalized content): 0 keeps, 1 drops.
    assert not out[0].is_exact_dup and out[1].is_exact_dup
    # 0/1/4 form one near-dup cluster; only the min id survives it.
    assert not out[0].is_near_dup and out[4].is_near_dup
    assert out[0].keep and not out[1].keep and not out[4].keep
    # Language gate: stopword-bearing rows guess en/de and pass; doc 3
    # has no stopwords at all -> 'unknown' -> dropped by the gate.
    assert out[0].pass_lang and out[2].pass_lang
    assert out[3].lang_guess == "unknown" and not out[3].pass_lang and not out[3].keep
    # Tighten quality: nobody passes, keep goes all-False.
    strict = corpus.corpus_filter(docs, min_quality=2.0).collect()
    assert not any(r.keep for r in strict)
    assert all(r.quality_score < 2.0 for r in strict)


def test_hash_split_deterministic_and_salted(spark):
    from polars_trading_spark.functions import corpus

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r.doc_id: r.split for r in corpus.hash_split(df).collect()}
    b = {r.doc_id: r.split for r in corpus.hash_split(df).collect()}
    assert a == b  # same salt -> identical assignment
    # Weights ~ respected (98/1/1 over 2000 ids).
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] > 1900 and c["val"] > 0 and c["test"] > 0
    # A different salt re-draws: some documents must move.
    d = {r.doc_id: r.split for r in corpus.hash_split(df, salt="other").collect()}
    assert d != a
    # Subset stability: splitting half the corpus assigns each id the
    # same split it had in the full corpus (leakage-safety property).
    half = spark.createDataFrame([(i,) for i in range(0, 2000, 2)], "doc_id long")
    h = {r.doc_id: r.split for r in corpus.hash_split(half).collect()}
    assert all(a[i] == s for i, s in h.items())


def test_tfidf_topk_golden(spark):
    from polars_trading_spark.functions import tfidf

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.token): r
        for r in tfidf.tfidf_topk(docs, k=2).collect()
    }
    import math

    # doc 1: apple tf=2 df=1, banana tf=1 df=2.
    idf = lambda df_: math.log((3 + 1) / (df_ + 1)) + 1
    assert out[(1, "apple")].tfidf == pytest.approx(2 * idf(1))
    assert out[(1, "apple")].rank == 1
    assert out[(1, "banana")].tfidf == pytest.approx(1 * idf(2))
    assert out[(1, "banana")].rank == 2
    # doc 3: single term, rank 1, tf=3.
    assert out[(3, "cherry")].tf == 3 and out[(3, "cherry")].rank == 1


def test_vocabulary_rank_and_ties(spark):
    from polars_trading_spark.functions import tfidf

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x z"), (3, "x y")],
        "doc_id long, text string",
    )
    rows = {r.token: r for r in tfidf.vocabulary(docs, top_k=10).collect()}
    assert rows["x"].rank == 1 and rows["x"].doc_freq == 3
    # y (df=2) before z (df=1); total_count breaks no tie here.
    assert rows["y"].rank == 2 and rows["z"].rank == 3
    # Unranked mode returns the full vocabulary without a rank column.
    full = tfidf.vocabulary(docs)
    assert "rank" not in full.columns and full.count() == 3


def test_corpus_stats_exact_and_sketch(spark):
    from polars_trading_spark.functions import corpus

    docs = spark.createDataFrame(
        [(i, "en", "the quick brown fox " * (1 + i % 3)) for i in range(30)]
        + [(100, "de", "der hund und die katze")],
        "doc_id long, lang string, text string",
    )
    rows = {r.lang: r for r in corpus.corpus_stats(docs).collect()}
    assert rows["en"].n_docs == 30
    # 3 distinct repeat counts -> 3 distinct fingerprints.
    assert rows["en"].distinct_fingerprints == 3
    assert rows["de"].n_docs == 1 and rows["de"].p50_tokens == 5.0
    # Sketch mode: same schema, counts exact, percentiles approximate.
    sk = {r.lang: r for r in corpus.corpus_stats(docs, exact=False).collect()}
    assert sk["en"].n_docs == 30
    assert abs(sk["en"].p50_tokens - rows["en"].p50_tokens) <= 2
    assert abs(sk["en"].distinct_fingerprints - 3) <= 1


def test_repetition_profile_planted(spark):
    rows = [
        (0, "en", "the cat sat on the mat and then the dog sat on the mat again"),
        (1, "en", "alpha beta gamma delta epsilon zeta eta theta"),  # no repeats
        (2, "en", "spam spam spam spam spam spam spam spam"),       # max repetition
        (3, "en", "One sentence. Another sentence. One sentence. Third one!"),
        (4, "en", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: r
        for r in text.repetition_profile(df, text_col="text", keep=("doc_id", "lang")).collect()
    }
    # all-unique doc: zero repetition everywhere
    assert out[1]["rep_2gram_frac"] == 0.0 and out[1]["rep_4gram_frac"] == 0.0
    # pure spam: 8 tokens -> 7 bigrams, 1 distinct -> 6/7
    assert out[2]["rep_2gram_frac"] == pytest.approx(6 / 7)
    # "sat on the mat" repeats -> some 3-gram repetition but less than spam
    assert 0.0 < out[0]["rep_3gram_frac"] < out[2]["rep_3gram_frac"]
    # 4 sentences, one repeated -> 1 - 3/4
    assert out[3]["dup_sentence_frac"] == pytest.approx(0.25)
    # empty doc: all zeros, no division errors
    assert out[4]["rep_2gram_frac"] == 0.0 and out[4]["dup_sentence_frac"] == 0.0


# ---------------------------------------------------------------------------
# Paragraph-level unit dedup (functions/dedup.py::unit_dedup)
# ---------------------------------------------------------------------------


def test_unit_dedup_first_occurrence_wins(spark):
    from polars_trading_spark.functions.dedup import unit_dedup

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",  # 2 units of 3
                "alpha beta gamma one two three",  # unit0 dups doc0
                "one two three alpha beta gamma",  # both units dup
                "",  # empty doc
            ],
        }
    )
    out = (
        unit_dedup(spark.createDataFrame(pdf), unit_tokens=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_dup_units"] == 0
    assert out.loc[0, "text_deduped"] == "alpha beta gamma delta epsilon zeta"
    assert out.loc[1, "n_dup_units"] == 1
    assert out.loc[1, "text_deduped"] == "one two three"
    assert out.loc[2, "dup_unit_frac"] == 1.0
    assert out.loc[2, "text_deduped"] == ""
    assert out.loc[3, "n_units"] == 0 and pd.isna(out.loc[3, "dup_unit_frac"])


def test_unit_dedup_within_doc_repeat(spark):
    """A unit repeated inside one document is a duplicate of itself."""
    from polars_trading_spark.functions.dedup import unit_dedup

    pdf = pd.DataFrame({"doc_id": [7], "text": ["spam ham eggs spam ham eggs"]})
    out = unit_dedup(spark.createDataFrame(pdf), unit_tokens=3).toPandas().iloc[0]
    assert out["n_units"] == 2 and out["n_dup_units"] == 1
    assert out["text_deduped"] == "spam ham eggs"


def test_unit_dedup_partial_trailing_unit(spark):
    from polars_trading_spark.functions.dedup import unit_dedup

    pdf = pd.DataFrame({"doc_id": [0], "text": ["one two three four"]})
    out = unit_dedup(spark.createDataFrame(pdf), unit_tokens=3).toPandas().iloc[0]
    # 4 tokens -> one full unit + one 1-token trailer
    assert out["n_units"] == 2
    assert out["text_deduped"] == "one two three four"


# ---------------------------------------------------------------------------
# Unigram LM scoring (functions/text.py::unigram_logprob)
# ---------------------------------------------------------------------------


def test_unigram_logprob_hand_model(spark):
    import math

    from polars_trading_spark.functions.text import unigram_logprob

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a a b", "b c", ""],
        }
    )
    out = (
        unigram_logprob(spark.createDataFrame(pdf), smoothing_k=0.5)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # counts: a=2, b=2, c=1; N=5, V=3, denom=6.5
    lp = {t: math.log((c + 0.5) / 6.5) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    exp0 = (2 * lp["a"] + lp["b"]) / 3
    exp1 = (lp["b"] + lp["c"]) / 2
    assert out.loc[0, "mean_logprob"] == pytest.approx(exp0, rel=1e-12)
    assert out.loc[1, "mean_logprob"] == pytest.approx(exp1, rel=1e-12)
    assert out.loc[1, "ppl"] == pytest.approx(math.exp(-exp1), rel=1e-12)
    assert out.loc[2, "n_tokens"] == 0 and pd.isna(out.loc[2, "mean_logprob"])


def test_unigram_logprob_ranks_gibberish_higher_ppl(spark):
    """Rare-token documents score higher perplexity than ones made of
    corpus-frequent tokens."""
    from polars_trading_spark.functions.text import unigram_logprob

    common = "the cat sat on the mat " * 20
    rows = [(i, common) for i in range(9)] + [(9, "zyx qwv jkl pqr mnb vfr")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = unigram_logprob(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    assert out.loc[9, "ppl"] > out.loc[0, "ppl"] * 5


# ---------------------------------------------------------------------------
# IVF-PQ (functions/similarity.py::ivf_pq_topk)
# ---------------------------------------------------------------------------


def _clustered_vectors(n=300, dim=32, n_clusters=6, noise=0.05, seed=13):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = c + rng.normal(0, noise, dim)
        rows.append((i, [float(x) for x in v]))
    return rows


def test_ivf_pq_recall_on_clustered_data(spark):
    from polars_trading_spark.functions.similarity import cosine_topk, ivf_pq_topk

    # Moderate within-cluster spread: PQ can only rank what survives
    # quantization, so the test regime keeps neighbor gaps above the
    # codebook resolution (16 subspaces x 32 codes over 32 dims).
    rows = _clustered_vectors(noise=0.3)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 12)
    exact = cosine_topk(emb, q, k=5).toPandas()
    pq = ivf_pq_topk(emb, q, k=5, n_cells=6, nprobe=6, m_sub=16, n_codes=32).toPandas()
    sa = exact.groupby("query_id").vec_id.apply(set)
    sb = pq.groupby("query_id").vec_id.apply(set)
    recall = sum(len(sa[i] & sb[i]) for i in sa.index) / sum(len(sa[i]) for i in sa.index)
    assert recall >= 0.6, recall


def test_ivf_pq_score_approximates_cosine(spark):
    """More codes -> better inner-product approximation: mean absolute
    error of pq_score vs true cosine must shrink from 2 to 8 codes."""
    import numpy as np

    from polars_trading_spark.functions.similarity import cosine, ivf_pq_topk

    rows = _clustered_vectors()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 12)

    def mae(n_codes):
        pq = ivf_pq_topk(emb, q, k=5, n_cells=6, nprobe=6, m_sub=4, n_codes=n_codes)
        joined = (
            pq.join(emb.select(F.col("vec_id"), F.col("embedding").alias("__v")), "vec_id")
            .join(
                emb.select(
                    F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q")
                ),
                "query_id",
            )
            .withColumn("__true", cosine(F.col("__q"), F.col("__v")))
        )
        pdf = joined.select("pq_score", "__true").toPandas()
        return float(np.abs(pdf.pq_score - pdf.__true).mean())

    assert mae(8) < mae(2)


def test_ivf_pq_dim_divisibility(spark):
    from polars_trading_spark.functions.similarity import ivf_pq_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        ivf_pq_topk(emb, emb, m_sub=2)


# ---------------------------------------------------------------------------
# Training-mixture sampling (functions/corpus.py::mix_corpus)
# ---------------------------------------------------------------------------


def test_mix_corpus_rates_and_epochs(spark):
    from polars_trading_spark.functions.corpus import mix_corpus

    # src_a: 10 docs x 10 tokens = 100 tokens; src_b: 40 docs x 10 = 400.
    rows = []
    for i in range(10):
        rows.append((i, "src_a", "tok " * 10))
    for i in range(10, 50):
        rows.append((i, "src_b", "tok " * 10))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_corpus(
        docs,
        weights={"src_a": 0.5, "src_b": 0.5},
        target_tokens=400,
        max_epochs=4.0,
    ).toPandas()
    # src_a needs 200 of 100 tokens -> rate 2.0: every doc exactly twice.
    a = out[out.source == "src_a"]
    assert sorted(a.groupby("doc_id").epoch.count()) == [2] * 10
    assert (a.mix_rate == 2.0).all()
    # src_b needs 200 of 400 -> rate 0.5: a strict subset, epoch always 0.
    b = out[out.source == "src_b"]
    assert 0 < len(b) < 40
    assert (b.epoch == 0).all()
    # Unnamed sources are dropped entirely.
    assert set(out.source) == {"src_a", "src_b"}


def test_mix_corpus_deterministic_and_capped(spark):
    from polars_trading_spark.functions.corpus import mix_corpus

    rows = [(i, "s", "tok " * 5) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kw = dict(weights={"s": 1.0}, target_tokens=10_000, max_epochs=3.0)
    a = mix_corpus(docs, **kw).toPandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    b = mix_corpus(docs, **kw).toPandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    assert a.equals(b)
    # demand far exceeds supply -> capped at 3 epochs each
    assert a.groupby("doc_id").epoch.count().max() == 3
    assert (a.mix_rate == 3.0).all()


def test_mix_corpus_validation(spark):
    from polars_trading_spark.functions.corpus import mix_corpus

    docs = spark.createDataFrame([(0, "s", "x")], "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="target_tokens"):
        mix_corpus(docs, weights={"s": 1.0}, target_tokens=0)
    with pytest.raises(ValueError, match="weights"):
        mix_corpus(docs, weights={}, target_tokens=10)


# ---------------------------------------------------------------------------
# Sequence packing (functions/corpus.py::pack_sequences)
# ---------------------------------------------------------------------------


def test_pack_sequences_budget_respected(spark):
    import numpy as np

    from polars_trading_spark.functions.corpus import pack_sequences

    rng = np.random.default_rng(31)
    rows = [(i, "w " * int(rng.integers(5, 120))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs, budget_tokens=128, n_shards=3).toPandas()
    assert len(out) == 200  # every doc packed exactly once
    g = out.groupby(["shard", "seq_id"])
    fill = g.n_tokens.sum()
    over = fill[fill > 128]
    # only single-oversized-doc sequences may exceed the budget
    for (shard, seq), tot in over.items():
        grp = out[(out.shard == shard) & (out.seq_id == seq)]
        assert len(grp) == 1 and grp.n_tokens.iloc[0] > 128
    # offsets are the running sum inside each sequence
    for (_, _), grp in g:
        grp = grp.sort_values("seq_offset")
        assert grp.seq_offset.iloc[0] == 0
        assert (
            grp.seq_offset.to_numpy()[1:]
            == grp.seq_offset.to_numpy()[:-1] + grp.n_tokens.to_numpy()[:-1]
        ).all()


def test_pack_sequences_greedy_first_fit(spark):
    """Docs sized so the greedy boundary is unambiguous: the hash order
    is deterministic, so packing 3+3+3 into budget 7 gives [2, 1]."""
    from polars_trading_spark.functions.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(3)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget_tokens=7, n_shards=1).toPandas()
    sizes = sorted(out.groupby("seq_id").doc_id.count())
    assert sizes == [1, 2]


def test_pack_sequences_deterministic_shuffle(spark):
    from polars_trading_spark.functions.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 17 + 1)) for i in range(100)], "doc_id long, text string"
    )
    a = pack_sequences(docs, budget_tokens=64).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        pack_sequences(docs.repartition(7), budget_tokens=64)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)  # layout-independent
    c = pack_sequences(docs, budget_tokens=64, salt="other").toPandas()
    assert not a.equals(c.sort_values("doc_id").reset_index(drop=True))  # salt re-shuffles


# ---------------------------------------------------------------------------
# TF-IDF cosine pairs (functions/tfidf.py::tfidf_cosine_pairs)
# ---------------------------------------------------------------------------


def test_tfidf_cosine_pairs_golden(spark):
    import math

    from polars_trading_spark.functions.tfidf import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),
            (1, "apple banana cherry"),  # identical -> cosine 1.0
            (2, "apple banana mango"),  # shares 2 of 3 terms
            (3, "xylophone zebra quartz"),  # disjoint
        ],
        "doc_id long, text string",
    )
    out = (
        tfidf_cosine_pairs(docs, threshold=0.1, max_doc_freq_frac=1.0)
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    assert out.loc[(0, 1), "cosine_sim"] == pytest.approx(1.0)
    # hand check (0,2): N=4; df(apple)=df(banana)=3, df(cherry)=2, df(mango)=1
    ia = math.log(5 / 4) + 1
    ic = math.log(5 / 3) + 1
    im = math.log(5 / 2) + 1
    expect = (2 * ia * ia) / math.sqrt((2 * ia * ia + ic * ic) * (2 * ia * ia + im * im))
    assert out.loc[(0, 2), "cosine_sim"] == pytest.approx(expect, rel=1e-6)
    assert (3 not in out.index.get_level_values("doc_a")) and (
        3 not in out.index.get_level_values("doc_b")
    )


def test_tfidf_cosine_max_df_prunes_universal_terms(spark):
    from polars_trading_spark.functions.tfidf import tfidf_cosine_pairs

    # 'the' appears in every doc; with max_df 0.5 it cannot create pairs.
    docs = spark.createDataFrame(
        [(i, f"the unique{i} word{i}") for i in range(6)], "doc_id long, text string"
    )
    out = tfidf_cosine_pairs(docs, threshold=0.01, max_doc_freq_frac=0.5).toPandas()
    assert len(out) == 0
    out_all = tfidf_cosine_pairs(docs, threshold=0.01, max_doc_freq_frac=1.0).toPandas()
    assert len(out_all) == 15  # all pairs share 'the'


def test_bigram_logprob_hand_model(spark):
    """2-doc corpus small enough to compute the interpolated model by
    hand (k=1, lambda=0.5)."""
    import math

    from polars_trading_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in bigram_logprob(docs, smoothing_k=1.0, interpolation=0.5).collect()
    }
    # corpus: tokens a,b,a,b,b,a -> c(a)=3, c(b)=3, N=6, V=2
    # bigrams: (a,b) x2, (b,a) x2  [doc1: a>b, b>a, a>b; doc2: b>a]
    # wait doc1 "a b a b": (a,b),(b,a),(a,b); doc2 "b a": (b,a)
    # c(a,b)=2, c(b,a)=2
    N, V, k, lam = 6.0, 2.0, 1.0, 0.5
    pu = {"a": (3 + k) / (N + k * V), "b": (3 + k) / (N + k * V)}
    def pb(s, t, c):
        return (c + k) / (3 + k * V)
    lp1 = (
        math.log(pu["a"])                                  # first token
        + math.log(lam * pb("a", "b", 2) + (1 - lam) * pu["b"])
        + math.log(lam * pb("b", "a", 2) + (1 - lam) * pu["a"])
        + math.log(lam * pb("a", "b", 2) + (1 - lam) * pu["b"])
    ) / 4
    assert out[1]["n_tokens"] == 4
    assert out[1]["mean_logprob"] == pytest.approx(lp1, rel=1e-12)
    assert out[1]["ppl"] == pytest.approx(math.exp(-lp1), rel=1e-12)


def test_bigram_logprob_order_sensitivity(spark):
    """Scrambled word order must score worse (higher ppl) than natural
    order even when the unigram distribution is identical."""
    from polars_trading_spark.functions.text import bigram_logprob

    natural = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, natural) for i in range(10)]
    rows.append((100, "mat the on sat cat the rug the on dog and sat the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"] for r in bigram_logprob(docs).collect()}
    assert out[100] > out[0] * 1.5


def test_bigram_logprob_empty_doc(spark):
    from polars_trading_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["ppl"] is None


def test_bigram_logprob_validation(spark):
    from polars_trading_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="smoothing_k"):
        bigram_logprob(docs, smoothing_k=0.0)
    with pytest.raises(ValueError, match="interpolation"):
        bigram_logprob(docs, interpolation=1.5)


def test_corpus_funnel_nesting_and_counts(spark):
    """Funnel counts must be monotone non-increasing and consistent with
    corpus_filter's own flags on a crafted corpus."""
    from polars_trading_spark.functions.corpus import corpus_filter, corpus_funnel

    good = "the quick brown fox jumps over the lazy dog again and again today " * 3
    rows = [
        (1, good + "one"),
        (2, good + "two"),
        (3, good + "one"),          # exact dup of 1 (normalized)
        (4, "zz qq xx"),            # fails token/lang gates
        (5, good + "one extra"),    # near dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_tokens=10, max_tokens=1000, min_quality=0.0)
    funnel = {r["stage"]: r for r in corpus_funnel(docs, **kw).collect()}
    flags = corpus_filter(docs, **kw).collect()

    assert funnel["raw"]["n_docs"] == 5
    q = [r for r in flags if r["pass_lang"] and r["pass_tokens"] and r["pass_quality"]]
    assert funnel["quality"]["n_docs"] == len(q)
    qe = [r for r in q if not r["is_exact_dup"]]
    assert funnel["exact_dedup"]["n_docs"] == len(qe)
    keep = [r for r in flags if r["keep"]]
    assert funnel["near_dedup"]["n_docs"] == len(keep)
    # monotone
    ds = [funnel[s]["n_docs"] for s in ("raw", "quality", "exact_dedup", "near_dedup")]
    ts = [funnel[s]["n_tokens"] for s in ("raw", "quality", "exact_dedup", "near_dedup")]
    assert ds == sorted(ds, reverse=True)
    assert ts == sorted(ts, reverse=True)
    # the exact dup (doc 3) must fall out at stage 2
    assert funnel["exact_dedup"]["n_docs"] < funnel["quality"]["n_docs"]


def test_pcm_features_numpy_golden(spark):
    """Decode-side features must equal a direct numpy computation on
    the same generated samples."""
    import numpy as np

    from polars_trading_spark.functions.multimodal import pcm_features, synthesize_pcm

    docs = spark.createDataFrame([(7,), (123,)], "doc_id long")
    out = {r["media_id"]: r for r in pcm_features(synthesize_pcm(docs)).collect()}
    for m in (7, 123):
        n = 400 + m % 800
        i = np.arange(n)
        s = ((m * 7919 + i * 104729) % 65536) - 32768
        r = out[m]
        assert r["n_samples"] == n
        assert r["rms"] == pytest.approx(float(np.sqrt((s.astype(np.int64) ** 2).mean())), rel=1e-12)
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int(((s[:-1] * s[1:]) < 0).sum())
        assert r["duration_ms"] == pytest.approx(n * 1000 / 16000, rel=1e-12)


def test_pcm_payload_roundtrip_bytes(spark):
    """The payload really is little-endian int16 bytes of the declared
    length — the binary contract a real audio tape would satisfy."""
    import numpy as np

    from polars_trading_spark.functions.multimodal import synthesize_pcm

    docs = spark.createDataFrame([(42,)], "doc_id long")
    row = synthesize_pcm(docs).collect()[0]
    n = 400 + 42 % 800
    assert len(row["payload"]) == 2 * n
    s = np.frombuffer(row["payload"], dtype="<i2")
    assert s[0] == ((42 * 7919) % 65536) - 32768


def test_parse_image_header_real_formats():
    import struct

    from polars_trading_spark.functions.multimodal import parse_image_header

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    )
    assert parse_image_header(png) == ("png", 320, 200)

    gif = b"GIF89a" + struct.pack("<HH", 64, 48) + b"\x00" * 4
    assert parse_image_header(gif) == ("gif", 64, 48)

    # top-down BMP stores negative height; parser reports magnitude
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + 120, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 10, -4, 1, 24, 0, 120, 2835, 2835, 0, 0)
        + b"\x00" * 120
    )
    assert parse_image_header(bmp) == ("bmp", 10, 4)

    # text that merely starts with a magic prefix must NOT parse: "BM"
    # needs the DIB header-size field, PNG needs the full 8-byte sig.
    assert parse_image_header(b"BM is a common abbreviation in text") is None
    assert parse_image_header(b"PNG files start differently") is None
    assert parse_image_header(b"") is None


def test_parse_jpeg_sof_marker_walk():
    import struct

    from polars_trading_spark.functions.multimodal import parse_image_header

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof0 = struct.pack(">BHHB", 8, 480, 640, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    # SOF behind two variable-length segments (APP0 + COM) and a
    # restart-marker (standalone, no length word)
    jpeg = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00" + b"\x00" * 9)
        + seg(0xFE, b"a comment")
        + b"\xff\xd0"
        + seg(0xC0, sof0)
        + b"\xff\xd9"
    )
    assert parse_image_header(jpeg) == ("jpeg", 640, 480)
    # progressive (SOF2) carries dimensions the same way
    assert parse_image_header(
        b"\xff\xd8" + seg(0xC2, sof0) + b"\xff\xd9"
    ) == ("jpeg", 640, 480)
    # DHT (C4) is NOT a frame header: dims inside it must not parse
    assert (
        parse_image_header(b"\xff\xd8" + seg(0xC4, sof0) + b"\xff\xd9") is None
    )
    # truncated stream / EOI before SOF / desync all return None
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00") is None
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None
    assert parse_image_header(b"\xff\xd8garbage") is None


def test_synthesize_jpeg_roundtrips_through_real_parser(spark):
    from polars_trading_spark.functions.multimodal import (
        parse_image_header,
        synthesize_jpeg,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 1, 17, 376, 377, 612, 613)],
        "doc_id long, text string",
    )
    for r in synthesize_jpeg(docs).collect():
        m = r["media_id"]
        assert len(r["payload"]) == 110
        assert parse_image_header(bytes(r["payload"])) == (
            "jpeg",
            16 + m % 613,
            16 + m % 377,
        ), m


def test_synthesize_bmp_roundtrips_through_real_parser(spark):
    from polars_trading_spark.functions.multimodal import (
        parse_image_header,
        synthesize_bmp,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 1, 7, 28, 29, 456)], "doc_id long, text string"
    )
    for r in synthesize_bmp(docs).collect():
        m = r["media_id"]
        got = parse_image_header(bytes(r["payload"]))
        assert got == ("bmp", 4 + m % 29, 3 + m % 17), r["media_id"]
        # spec invariant: declared file size == actual payload length
        import struct

        declared = struct.unpack("<I", bytes(r["payload"][2:6]))[0]
        assert declared == len(r["payload"])


class TestChunkDocuments:
    def _chunks(self, spark, rows, **kw):
        from polars_trading_spark.functions.corpus import chunk_documents

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return sorted(
            chunk_documents(df, **kw).collect(),
            key=lambda r: (r["doc_id"], r["chunk_idx"]),
        )

    def test_sliding_window_coverage_and_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(25))
        out = self._chunks(spark, [(1, text)], chunk_tokens=10, overlap=3)
        # n=25, stride=7 -> chunks start at 0,7,14,21 (21+10 covers 25)
        assert [r["start_token"] for r in out] == [0, 7, 14, 21]
        assert all(r["n_chunks"] == 4 for r in out)
        assert [r["chunk_n_tokens"] for r in out] == [10, 10, 10, 4]
        # consecutive chunks share exactly `overlap` tokens
        a, b = out[0]["chunk_text"].split(), out[1]["chunk_text"].split()
        assert a[-3:] == b[:3]
        # every token appears in order across chunks (coverage)
        seen = []
        for r in out:
            toks = r["chunk_text"].split()
            seen.extend(toks[len(seen) - r["start_token"]:])
        assert seen == [f"t{i}" for i in range(25)]

    def test_short_doc_single_chunk_and_exact_fit(self, spark):
        out = self._chunks(
            spark, [(1, "a b c"), (2, " ".join("x" * 1 for _ in range(10)))],
            chunk_tokens=10, overlap=2,
        )
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_n_tokens"] == 3
        # exactly chunk_tokens tokens -> one chunk, not two
        assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_n_tokens"] == 10

    def test_empty_and_min_tokens_dropped(self, spark):
        out = self._chunks(
            spark, [(1, "   "), (2, "one two"), (3, "solo")],
            chunk_tokens=4, overlap=0, min_tokens=2,
        )
        assert {r["doc_id"] for r in out} == {2}

    def test_zero_overlap_partitions_exactly(self, spark):
        text = " ".join(f"w{i}" for i in range(12))
        out = self._chunks(spark, [(1, text)], chunk_tokens=5, overlap=0)
        assert [r["start_token"] for r in out] == [0, 5, 10]
        assert [r["chunk_n_tokens"] for r in out] == [5, 5, 2]

    def test_validation(self, spark):
        from polars_trading_spark.functions.corpus import chunk_documents

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=8, overlap=8)

    def test_no_shuffle_no_python(self, spark, docs):
        from polars_trading_spark.functions.corpus import chunk_documents
        from polars_trading_spark.plans import count_exchanges, count_python_stages

        out = chunk_documents(docs, chunk_tokens=32, overlap=4)
        assert count_exchanges(out) == 0
        assert count_python_stages(out) == 0


def test_char_entropy_known_values(spark):
    import math

    from polars_trading_spark.functions.text import char_entropy, normalize_text

    rows = [
        (1, "aaaa"),            # single symbol -> 0
        (2, "ab" * 8),          # two equiprobable -> ln 2
        (3, ""),                # empty -> null
        (4, "abcd"),            # four equiprobable -> ln 4
        (5, "The quick brown fox jumps over the lazy dog"),  # prose-ish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "__chars",
        F.filter(F.split(normalize_text(F.col("text")), ""), lambda c: c != ""),
    )
    out = {r["doc_id"]: r["h"] for r in df.select("doc_id", char_entropy(F.col("__chars")).alias("h")).collect()}
    assert out[1] == pytest.approx(0.0, abs=1e-12)
    assert out[2] == pytest.approx(math.log(2), rel=1e-12)
    assert out[3] is None
    assert out[4] == pytest.approx(math.log(4), rel=1e-12)
    assert 2.5 < out[5] < math.log(37)  # pangram: high but bounded by alphabet


class TestPmiCooccurrence:
    def test_hand_computed_pmi(self, spark):
        import math

        from polars_trading_spark.functions.text import pmi_cooccurrence

        # "x y" always adjacent; "x z" never within window 1
        docs = spark.createDataFrame(
            [(i, "x y q z") for i in range(6)], "doc_id long, text string"
        )
        out = {
            (r["tok_a"], r["tok_b"]): r
            for r in pmi_cooccurrence(
                docs, window=1, min_pair_count=1, top_k=10
            ).collect()
        }
        # pairs per doc: (x,y), (q,y), (q,z) -> each c_ab=6, N=18
        # marginals: y=12, x=6, q=12, z=6
        assert set(out) == {("x", "y"), ("q", "y"), ("q", "z")}
        r = out[("x", "y")]
        assert r["c_ab"] == 6 and r["c_a"] == 6 and r["c_b"] == 12
        assert r["pmi"] == pytest.approx(math.log(6 * 18 / (6 * 12)), rel=1e-12)
        # ranks deterministic: (q,z) and (x,y) tie on pmi -> pair asc
        ranked = sorted(out.values(), key=lambda r: r["rank"])
        assert [([r["tok_a"], r["tok_b"]]) for r in ranked] == [
            ["q", "z"], ["x", "y"], ["q", "y"],
        ]

    def test_min_pair_count_prunes(self, spark):
        from polars_trading_spark.functions.text import pmi_cooccurrence

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
        )
        out = pmi_cooccurrence(docs, window=1, min_pair_count=2, top_k=10).collect()
        assert {(r["tok_a"], r["tok_b"]) for r in out} == {("a", "b")}

    def test_validation_and_bounded_plan(self, spark, docs):
        from polars_trading_spark.functions.text import pmi_cooccurrence
        from polars_trading_spark.plans import (
            count_python_stages,
            unbounded_global_windows,
        )

        with pytest.raises(ValueError):
            pmi_cooccurrence(docs, window=0)
        with pytest.raises(ValueError):
            pmi_cooccurrence(docs, top_k=0)
        out = pmi_cooccurrence(docs, window=2, top_k=10)
        assert count_python_stages(out) == 0
        assert unbounded_global_windows(out) == []


class TestReadingEase:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    @staticmethod
    def _ref(text):
        import re

        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
        words = [w for w in norm.split(" ") if w]
        sents = max(1, len([s for s in re.split(r"[.!?]+", text) if s.strip()]))

        def syl(w):
            g = len(re.findall(r"[aeiouy]+", w))
            if w.endswith("e") and len(w) > 2 and g > 1:
                g -= 1
            return max(1, g)

        ns = sum(syl(w) for w in words)
        f = (
            206.835 - 1.015 * (len(words) / sents) - 84.6 * (ns / len(words))
            if words
            else None
        )
        return len(words), sents, ns, f

    def test_hand_golden_and_reference(self, spark):
        import pytest as pt

        from polars_trading_spark.functions.text import reading_ease

        texts = [
            "The quick brown fox jumps over the lazy dog.",
            "Notwithstanding considerable deliberation, implementation "
            "methodologies necessitate comprehensive evaluation! Indeed?",
            "no terminator here",
            "",
            "12 34 e",
        ]
        rows = {r["doc_id"]: r for r in reading_ease(self._docs(spark, texts)).collect()}
        for i, t in enumerate(texts):
            w, s, y, f = self._ref(t)
            assert rows[i]["n_words"] == w, i
            assert rows[i]["n_sentences"] == s, i
            assert rows[i]["n_syllables"] == y, i
            if f is None:
                assert rows[i]["flesch"] is None
            else:
                assert rows[i]["flesch"] == pt.approx(f, rel=1e-12), i
        # sanity: simple prose reads far easier than the polysyllabic one
        assert rows[0]["flesch"] > 80 > rows[1]["flesch"]
        # the fox sentence: 9 words, 1 sentence, 11 syllables
        assert (
            rows[0]["n_words"],
            rows[0]["n_sentences"],
            rows[0]["n_syllables"],
        ) == (9, 1, 11)

    def test_plan_zero_shuffle_zero_python(self, spark):
        from polars_trading_spark.functions.text import reading_ease
        from polars_trading_spark.plans import count_exchanges, count_python_stages

        out = reading_ease(self._docs(spark, ["a b. c!"]))
        assert count_python_stages(out) == 0
        assert count_exchanges(out) == 0


class TestDsirLogWeights:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, is_tgt boolean"
        )

    @staticmethod
    def _ref(rows, n_buckets):
        import hashlib
        import math
        import re
        from collections import Counter

        def h(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets

        def grams(t):
            norm = re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
            ws = [w for w in norm.split(" ") if w]
            return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

        ct, cr = Counter(), Counter()
        for _, t, tgt in rows:
            for g in grams(t):
                b = h(g)
                cr[b] += 1
                if tgt:
                    ct[b] += 1
        nt, nr = sum(ct.values()), sum(cr.values())
        out = {}
        for i, t, _ in rows:
            fs = Counter(h(g) for g in grams(t))
            if not fs:
                out[i] = (0, None)
                continue
            w = sum(
                c
                * (
                    math.log((ct[b] + 1) / (nt + n_buckets))
                    - math.log((cr[b] + 1) / (nr + n_buckets))
                )
                for b, c in fs.items()
            )
            out[i] = (sum(fs.values()), w)
        return out

    def test_matches_reference_and_ranks_target_like_docs_higher(self, spark):
        import pytest as pt

        from polars_trading_spark.functions.corpus import dsir_log_weights

        rows = [
            (0, "the model trains on curated encyclopedia articles daily", True),
            (1, "curated encyclopedia articles improve the model quality", True),
            (2, "the model trains on curated encyclopedia articles nightly", False),
            (3, "buy cheap pills online casino jackpot winner click now", False),
            (4, "casino jackpot pills cheap online winner now click here", False),
            (5, "", False),
        ]
        got = {
            r["doc_id"]: r
            for r in dsir_log_weights(
                self._docs(spark, rows), is_target_col="is_tgt", n_buckets=64
            ).collect()
        }
        ref = self._ref(rows, 64)
        for i, (nf, w) in ref.items():
            assert got[i]["n_feats"] == nf, i
            if w is None:
                assert got[i]["log_w"] is None
            else:
                assert got[i]["log_w"] == pt.approx(w, rel=1e-9), i
        # encyclopedia-flavored doc 2 outranks the spam docs
        assert got[2]["log_w"] > got[3]["log_w"]
        assert got[2]["log_w"] > got[4]["log_w"]

    def test_validation(self, spark):
        import pytest as pt

        from polars_trading_spark.functions.corpus import dsir_log_weights

        with pt.raises(ValueError):
            dsir_log_weights(
                self._docs(spark, [(0, "a b", True)]),
                is_target_col="is_tgt",
                n_buckets=1,
            )


class TestNgramNovelty:
    def test_planted_duplicates_and_unique_docs(self, spark):
        import pytest as pt

        from polars_trading_spark.functions.text import ngram_novelty

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog"),
                (1, "the quick brown fox jumps over the sleepy cat"),  # shares prefix grams with 0
                (2, "completely original words appear only here today"),
                (3, "hi"),  # < n tokens -> no grams
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
        # doc 2 shares nothing: fully novel
        assert out[2]["novelty"] == 1.0 and out[2]["n_novel"] == out[2]["n_grams"] == 5
        # docs 0/1: 9-token docs -> 7 trigrams each; the first five
        # trigrams (through "jumps over the") are shared
        assert out[0]["n_grams"] == 7
        shared = 5
        assert out[0]["n_novel"] == 7 - shared
        assert out[0]["novelty"] == pt.approx((7 - shared) / 7)
        assert out[1]["n_novel"] == 7 - shared
        # short doc: zero grams, null novelty
        assert out[3]["n_grams"] == 0 and out[3]["novelty"] is None

    def test_plan_zero_python(self, spark):
        from polars_trading_spark.functions.text import ngram_novelty
        from polars_trading_spark.plans import count_python_stages

        docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
        assert count_python_stages(ngram_novelty(docs)) == 0

    def test_plan_single_tokenizer_pass(self, spark):
        # The corpus-sized tokenizer explode must run ONCE: document
        # frequency is a count(*) window over the gram partition, not a
        # doc-frequency aggregate joined back (which re-executed the
        # whole explode — 2x the dominant stage at corpus scale).
        from polars_trading_spark.functions.text import ngram_novelty
        from polars_trading_spark.plans import plan_string

        docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
        import re

        plan = plan_string(ngram_novelty(docs), "executed")
        assert plan.count("Generate explode") == 1
        # exactly one join survives: the short-doc-preserving left join
        # on the id — the gram-keyed dfreq join is gone
        assert len(re.findall(r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)) == 1


class TestGumbelTopkSample:
    def _golden_keys(self, ids_weights, salt="pts-gumbel"):
        import hashlib
        import math

        mod = 1 << 30
        out = {}
        for i, w in ids_weights:
            h = int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16)
            u = ((h % mod) + 0.5) / mod
            out[i] = math.log(w) - math.log(-math.log(u))
        return out

    def test_matches_python_golden_and_is_without_replacement(self, spark):
        import pytest as pt

        from polars_trading_spark.functions.corpus import gumbel_topk_sample

        rows = [(i, float(10 + 7 * (i % 13))) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = gumbel_topk_sample(df, k=20, weight_col="w").collect()
        keys = self._golden_keys(rows)
        expect = sorted(keys, key=lambda i: (-keys[i], i))[:20]
        got = {r["rank"]: r for r in out}
        assert [got[j + 1]["doc_id"] for j in range(20)] == expect
        assert len({r["doc_id"] for r in out}) == 20  # no replacement
        for r in out:
            assert r["sample_key"] == pt.approx(keys[r["doc_id"]], rel=1e-12)

    def test_nonpositive_weights_excluded_and_validation(self, spark):
        import pytest as pt

        from polars_trading_spark.functions.corpus import gumbel_topk_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double",
        )
        out = gumbel_topk_sample(df, k=10, weight_col="w").collect()
        assert [r["doc_id"] for r in out] == [1]
        with pt.raises(ValueError, match="k must be"):
            gumbel_topk_sample(df, k=0, weight_col="w")

    def test_plan_take_ordered_no_global_sort(self, spark):
        from polars_trading_spark.functions.corpus import gumbel_topk_sample
        from polars_trading_spark.plans import count_python_stages, plan_string

        df = spark.createDataFrame([(1, 5.0)], "doc_id long, w double")
        out = gumbel_topk_sample(df, k=10, weight_col="w")
        assert count_python_stages(out) == 0
        assert "TakeOrderedAndProject" in plan_string(out, "executed")


class TestHardNegatives:
    ROWS = [
        (0, [1.0, 0.0]),          # query
        (1, [1.0, 0.0]),          # exact dup: cos 1.0 -> above band
        (2, [0.95, 0.3122499]),   # near-dup: cos ~0.95 -> above band
        (3, [0.7, 0.71414284]),   # cos ~0.70 -> hard negative
        (4, [0.5, 0.8660254]),    # cos 0.50 -> hard negative
        (5, [0.0, 1.0]),          # cos 0.0  -> easy, below band
        (6, [-1.0, 0.0]),         # cos -1.0 -> below band
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "vec_id long, embedding array<float>")

    def test_band_membership_and_ranking(self, spark):
        import pytest as pt

        emb = self._df(spark)
        out = sorted(
            similarity.hard_negatives(
                emb, emb.where(F.col("vec_id") == 0), k=5, lo=0.3, hi=0.9
            ).collect(),
            key=lambda r: r["rank"],
        )
        assert [r["vec_id"] for r in out] == [3, 4]
        assert out[0]["cosine_sim"] == pt.approx(0.7, abs=1e-6)
        assert out[1]["cosine_sim"] == pt.approx(0.5, abs=1e-6)

    def test_k_truncates_and_validation(self, spark):
        import pytest as pt

        emb = self._df(spark)
        q = emb.where(F.col("vec_id") == 0)
        out = similarity.hard_negatives(emb, q, k=1, lo=0.3, hi=0.9).collect()
        assert [r["vec_id"] for r in out] == [3]
        with pt.raises(ValueError, match="k must be"):
            similarity.hard_negatives(emb, q, k=0)
        with pt.raises(ValueError, match="lo < hi"):
            similarity.hard_negatives(emb, q, lo=0.9, hi=0.3)

    def test_guard_unbounded_corpus(self, spark):
        import pytest as pt

        emb = self._df(spark)
        q = emb.where(F.col("vec_id") == 0)
        with pt.raises(ValueError, match="max_corpus_rows"):
            similarity.hard_negatives(emb, q, max_corpus_rows=3)


class TestClusterRepresentatives:
    def test_quality_keeper_beats_min_id(self, spark):
        docs = spark.createDataFrame(
            [
                # near-dup pair: doc 0 is boilerplate-wrapped, doc 1 clean.
                (0, "buy now " + "the quick brown fox jumps over the lazy dog " * 4),
                (1, "the quick brown fox jumps over the lazy dog " * 4),
                # singleton
                (2, "completely different text about astronomy and galaxies far away"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.cluster_representatives(
                docs, ngram=3, num_hashes=12, bands=4, jaccard_threshold=0.2
            ).collect()
        }
        assert out[0]["cluster_id"] == out[1]["cluster_id"]
        assert out[0]["cluster_size"] == out[1]["cluster_size"] == 2
        # exactly one representative per cluster, chosen by quality not id
        reps = [i for i in (0, 1) if out[i]["is_representative"]]
        assert len(reps) == 1
        best = max((0, 1), key=lambda i: (out[i]["quality_score"], -i))
        assert reps == [best]
        assert out[2]["cluster_size"] == 1 and out[2]["is_representative"]

    def test_explicit_quality_column_and_tie_to_lowest_id(self, spark):
        docs = spark.createDataFrame(
            [
                (7, "aa bb cc dd ee ff gg hh " * 3, 0.5),
                (3, "aa bb cc dd ee ff gg hh " * 3, 0.5),  # tie -> lowest id
            ],
            "doc_id long, text string, q double",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.cluster_representatives(
                docs, quality_col="q", jaccard_threshold=0.2
            ).collect()
        }
        assert out[3]["is_representative"] is True
        assert out[7]["is_representative"] is False


class TestVocabDivergence:
    def test_matches_python_golden(self, spark):
        import math
        from collections import Counter

        import pytest as pt

        from polars_trading_spark.functions.tfidf import vocab_divergence

        docs = spark.createDataFrame(
            [
                (0, "web", "the cat sat on the mat"),
                (1, "web", "the dog sat on the log"),
                (2, "book", "the cat chased the dog through tall grass"),
                (3, "wiki", "quantum field theory describes particle interactions"),
            ],
            "doc_id long, source string, text string",
        )
        out = {
            (r["group_a"], r["group_b"]): r
            for r in vocab_divergence(docs, group_col="source").collect()
        }
        corpora = {
            "web": "the cat sat on the mat the dog sat on the log".split(),
            "book": "the cat chased the dog through tall grass".split(),
            "wiki": "quantum field theory describes particle interactions".split(),
        }

        def js(a, b):
            ca, cb = Counter(corpora[a]), Counter(corpora[b])
            na, nb = sum(ca.values()), sum(cb.values())
            s = 0.0
            for t in set(ca) | set(cb):
                pa, pb = ca[t] / na, cb[t] / nb
                m = (pa + pb) / 2
                if pa > 0:
                    s += 0.5 * pa * math.log(pa / m)
                if pb > 0:
                    s += 0.5 * pb * math.log(pb / m)
            return s

        assert set(out) == {("book", "web"), ("book", "wiki"), ("web", "wiki")}
        for (a, b), r in out.items():
            assert r["js_nats"] == pt.approx(js(a, b), rel=1e-9), (a, b)
            assert r["js_bits"] == pt.approx(js(a, b) / math.log(2), rel=1e-9)
        # disjoint vocabularies (web vs wiki) hit the ln 2 ceiling
        assert out[("web", "wiki")]["js_bits"] == pt.approx(1.0)
        assert out[("web", "wiki")]["n_shared"] == 0
        # overlapping corpora sit strictly below it
        assert out[("book", "web")]["js_bits"] < 1.0
        assert out[("book", "web")]["n_shared"] > 0

    def test_plan_zero_python_no_global_window(self, spark):
        from polars_trading_spark.functions.tfidf import vocab_divergence
        from polars_trading_spark.plans import count_python_stages, unbounded_global_windows

        docs = spark.createDataFrame(
            [(0, "a", "x y"), (1, "b", "y z")], "doc_id long, source string, text string"
        )
        out = vocab_divergence(docs, group_col="source")
        assert count_python_stages(out) == 0
        assert unbounded_global_windows(out) == []


class TestEmbeddingCohesion:
    ROWS = [
        # label 0: tight cluster around +x
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.9805806756909202, 0.19611613513818404]),   # unit (5,1)/|.|
        (2, 0, [0.9805806756909202, -0.19611613513818404]),
        # label 1: antipodal pair -> centroid ~0, cohesion ~0
        (3, 1, [0.0, 1.0]),
        (4, 1, [0.0, -1.0]),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "vec_id long, label int, embedding array<float>"
        )

    def test_cohesion_golden(self, spark):
        import math

        import pytest as pt

        out = {
            r["label"]: r
            for r in similarity.embedding_cohesion(self._df(spark)).collect()
        }
        vecs0 = [v for _, l, v in self.ROWS if l == 0]
        cent0 = [sum(c) / 3 for c in zip(*vecs0)]
        norm0 = math.hypot(*cent0)
        cos0 = [
            sum(a * b for a, b in zip(v, cent0))
            / (math.hypot(*v) * norm0)
            for v in vecs0
        ]
        assert out[0]["n_vectors"] == 3
        assert out[0]["centroid_norm"] == pt.approx(norm0, rel=1e-6)
        assert out[0]["mean_cos_to_centroid"] == pt.approx(sum(cos0) / 3, rel=1e-6)
        # antipodal label: centroid collapses to ~0
        assert out[1]["centroid_norm"] == pt.approx(0.0, abs=1e-9)

    def test_centroid_similarity_golden(self, spark):
        import pytest as pt

        rows = [
            (0, 0, [1.0, 0.0]),
            (1, 0, [1.0, 0.0]),
            (2, 1, [0.0, 1.0]),   # orthogonal to label 0
            (3, 2, [-1.0, 0.0]),  # antipodal to label 0
        ]
        df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
        out = {
            (r["label_a"], r["label_b"]): r
            for r in similarity.centroid_similarity(df).collect()
        }
        assert out[(0, 1)]["centroid_cosine"] == pt.approx(0.0, abs=1e-9)
        assert out[(0, 2)]["centroid_cosine"] == pt.approx(-1.0, rel=1e-9)
        assert out[(0, 1)]["n_a"] == 2 and out[(0, 1)]["n_b"] == 1

    def test_plans_zero_python(self, spark):
        from polars_trading_spark.plans import count_python_stages

        df = self._df(spark)
        assert count_python_stages(similarity.embedding_cohesion(df)) == 0
        assert count_python_stages(similarity.centroid_similarity(df)) == 0


def test_dedup_recall_curve_one_pass_monotone(docs):
    """The curve from one candidate-generation pass: counts are
    non-increasing in the threshold, the lowest threshold reproduces
    dedup_recall_stats exactly, and hits never exceed either arm."""
    ts = (0.2, 0.4, 0.6)
    curve = {
        r["threshold"]: r
        for r in dedup.dedup_recall_curve(
            docs, thresholds=ts, num_hashes=12, bands=4, sample_fraction=None
        ).collect()
    }
    assert set(curve) == set(ts)
    prev_e = prev_l = None
    for t in ts:
        r = curve[t]
        assert r["n_hit"] <= min(r["n_exact"], r["n_lsh"])
        if prev_e is not None:
            assert r["n_exact"] <= prev_e and r["n_lsh"] <= prev_l
        prev_e, prev_l = r["n_exact"], r["n_lsh"]
        if r["n_exact"]:
            assert 0.0 <= r["recall"] <= 1.0
    single = dedup.dedup_recall_stats(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.2,
        sample_fraction=None,
    ).collect()[0]
    low = curve[0.2]
    assert (low["n_exact"], low["n_lsh"], low["n_hit"]) == (
        single["n_exact"], single["n_lsh"], single["n_hit"]
    )


def test_lsh_power_curve_matches_analytic_reference(docs):
    """Theory-vs-practice diagnostic: expected_hits equals the python
    recomputation of sum 1-(1-j^r)^b over the exact pair population
    (to the output rounding); counts nest across thresholds; measured
    hits never exceed the exact pair count."""
    ts = (0.2, 0.35, 0.5)
    k, b = 12, 4
    out = {
        r["threshold"]: r
        for r in dedup.lsh_power_curve(
            docs, thresholds=ts, num_hashes=k, bands=b, sample_fraction=None
        ).collect()
    }
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=min(ts), block_cols=()
    ).collect()
    r_rows = k // b
    assert len(out) == len(ts)
    prev_exact = None
    for t in sorted(ts):
        row = out[t]
        js = [p["jaccard"] for p in pairs if round(p["jaccard"], 9) >= round(t, 9)]
        assert row["n_exact"] == len(js)
        want = sum(1.0 - (1.0 - j**r_rows) ** b for j in js)
        assert row["expected_hits"] == pytest.approx(round(want, 6), abs=2e-6)
        assert 0 <= row["n_hit"] <= row["n_exact"]
        if row["n_exact"]:
            assert 0.0 <= row["expected_recall"] <= 1.0
            assert 0.0 <= row["recall"] <= 1.0
        if prev_exact is not None:
            assert row["n_exact"] <= prev_exact  # nesting across thresholds
        prev_exact = row["n_exact"]

    with pytest.raises(ValueError):
        dedup.lsh_power_curve(docs, num_hashes=10, bands=4)
    with pytest.raises(ValueError):
        dedup.lsh_power_curve(docs, thresholds=())


def test_png_palette_codec_roundtrip_and_validation():
    rng = np.random.RandomState(5)
    pal = [
        ((i * 37 + 11) % 256, (i * 59 + 23) % 256, (i * 83 + 47) % 256)
        for i in range(16)
    ]
    idx = rng.randint(0, 16, size=(13, 21), dtype=np.uint8)
    exp = np.array(pal, dtype=np.uint8)[idx.astype(np.int64)]
    blob = multimodal.png_encode(idx, color_type=3, palette=pal)
    assert multimodal.parse_image_header(blob) == ("png", 21, 13)
    assert np.array_equal(multimodal.png_decode(blob), exp)
    fmt, w, h, px = multimodal.decode_image(blob)
    assert (fmt, w, h) == ("png", 21, 13) and np.array_equal(px, exp)
    # isolate every unfilter path on the 1-byte-per-pixel index stream
    for f in range(5):
        b2 = multimodal.png_encode(idx, color_type=3, palette=pal, filters=[f])
        assert np.array_equal(multimodal.png_decode(b2), exp), f
    with pytest.raises(ValueError):
        multimodal.png_encode(idx, color_type=3)  # palette required
    with pytest.raises(ValueError):
        multimodal.png_encode(idx, color_type=3, palette=pal[:8])  # oob idx


def test_gif_interlaced_codec_matches_plain_rows():
    # pass-order storage + de-interlace must reproduce the row-major
    # pixels exactly, across heights exercising every pass subset
    for w, h in [(7, 11), (16, 9), (4, 1), (5, 2), (3, 3), (6, 8)]:
        j = np.arange(w * h, dtype=np.int64)
        ind = ((7 * j + 3) % multimodal.GIF_PALETTE_SIZE).tolist()
        plain = multimodal.gif_decode(multimodal.gif_encode(ind, w, h))
        inter = multimodal.gif_decode(
            multimodal.gif_encode(ind, w, h, interlace=True)
        )
        assert np.array_equal(plain, inter), (w, h)
    # the stored byte streams genuinely differ (rows really reordered)
    j = np.arange(8 * 8, dtype=np.int64)
    ind = ((5 * j + 1) % 16).tolist()
    assert multimodal.gif_encode(ind, 8, 8) != multimodal.gif_encode(
        ind, 8, 8, interlace=True
    )
    # interlace row order itself (spec appendix E)
    assert multimodal._gif_interlace_rows(8) == [0, 4, 2, 6, 1, 3, 5, 7]


def test_png_adam7_interlaced_roundtrip_all_types_dims_filters():
    rng = np.random.RandomState(9)
    for ct, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        for h, w in [(17, 29), (8, 8), (1, 1), (3, 5), (7, 2), (2, 13)]:
            px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
            blob = multimodal.png_encode(px, color_type=ct, interlace=True)
            assert np.array_equal(multimodal.png_decode(blob), px), (ct, h, w)
    # every filter type through every pass; palette + interlace combined
    for f in range(5):
        px = rng.randint(0, 256, size=(11, 9, 3), dtype=np.uint8)
        assert np.array_equal(
            multimodal.png_decode(
                multimodal.png_encode(px, interlace=True, filters=[f])
            ),
            px,
        ), f
    pal = [
        ((i * 37 + 11) % 256, (i * 59 + 23) % 256, (i * 83 + 47) % 256)
        for i in range(16)
    ]
    idx = rng.randint(0, 16, size=(13, 21), dtype=np.uint8)
    exp = np.array(pal, dtype=np.uint8)[idx.astype(np.int64)]
    blob = multimodal.png_encode(
        idx, color_type=3, palette=pal, interlace=True
    )
    assert np.array_equal(multimodal.png_decode(blob), exp)
    # interlaced stream genuinely differs from the sequential layout
    px = rng.randint(0, 256, size=(9, 9, 3), dtype=np.uint8)
    assert multimodal.png_encode(px) != multimodal.png_encode(
        px, interlace=True
    )


def test_jpeg_420_codec_dc_only_exact_and_scope():
    from polars_trading_spark.functions.multimodal import (
        decode_image,
        jpeg_decode,
        jpeg_encode_ycbcr_420,
    )

    m, w, h = 23, 32, 16
    nm = (w // 16) * (h // 16)
    mcus = []
    for k in range(nm):
        ys = []
        for s in range(4):
            blk = [0] * 64
            blk[0] = ((m + 13 * (4 * k + s)) % 64) - 32
            ys.append(blk)
        cb = [0] * 64
        cb[0] = ((2 * m + 7 * k) % 64) - 32
        cr = [0] * 64
        cr[0] = ((3 * m + 5 * k) % 64) - 32
        mcus.append((tuple(ys), cb, cr))
    fmt, ww, hh, px = decode_image(jpeg_encode_ycbcr_420(mcus, w, h))
    assert (fmt, ww, hh) == ("jpeg", w, h)
    assert px.shape == (h, w, 3)
    for y in range(h):
        for x in range(w):
            k = (y // 16) * (w // 16) + x // 16
            s = ((y % 16) // 8) * 2 + (x % 16) // 8
            Y = 2 * ((m + 13 * (4 * k + s)) % 64) + 64
            Cb = 2 * ((2 * m + 7 * k) % 64) + 64
            Cr = 2 * ((3 * m + 5 * k) % 64) + 64
            want = np.clip(
                [
                    np.floor(Y + 1.402 * (Cr - 128.0) + 0.5),
                    np.floor(
                        Y
                        - 0.344136 * (Cb - 128.0)
                        - 0.714136 * (Cr - 128.0)
                        + 0.5
                    ),
                    np.floor(Y + 1.772 * (Cb - 128.0) + 0.5),
                ],
                0,
                255,
            )
            assert (px[y, x] == want).all(), (y, x)
    # the four Y sub-blocks really land in their own quadrants: with
    # distinct DCs the luma changes across the 8-pixel boundary
    k0y = [2 * ((m + 13 * s) % 64) + 64 for s in range(4)]
    assert len(set(k0y)) == 4
    # validation: partial-MCU dims are legal since round 12, so the
    # geometry contract is the ceil-padded MCU count (24x16 -> 2 MCUs;
    # an off-by-one block list still raises)
    with pytest.raises(ValueError):
        jpeg_encode_ycbcr_420(mcus[:1], 24, 16)
    import struct

    app0 = b"\xff\xe0" + struct.pack(
        ">H5sHBHHBB", 16, b"JFIF\x00", 0x0102, 0, 72, 72, 0, 0
    )
    # 4:1:1 is IN scope since round 11 (integer-ratio sampling):
    # header-only means malformed, not unsupported
    sof_411 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 64, 3) + bytes(
        [1, 0x41, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="no scan"):
        jpeg_decode(b"\xff\xd8" + app0 + sof_411 + b"\xff\xd9")


def test_jpeg_422_codec_dc_only_exact_and_scope():
    from polars_trading_spark.functions.multimodal import (
        decode_image,
        jpeg_encode_ycbcr_422,
    )

    m, w, h = 23, 32, 16
    nm = (w // 16) * (h // 8)
    mcus = []
    for k in range(nm):
        ys = []
        for s in range(2):
            blk = [0] * 64
            blk[0] = ((m + 13 * (2 * k + s)) % 64) - 32
            ys.append(blk)
        cb = [0] * 64
        cb[0] = ((2 * m + 7 * k) % 64) - 32
        cr = [0] * 64
        cr[0] = ((3 * m + 5 * k) % 64) - 32
        mcus.append((tuple(ys), cb, cr))
    fmt, ww, hh, px = decode_image(jpeg_encode_ycbcr_422(mcus, w, h))
    assert (fmt, ww, hh) == ("jpeg", w, h)
    assert px.shape == (h, w, 3)
    for y in range(h):
        for x in range(w):
            k = (y // 8) * (w // 16) + x // 16
            s = (x % 16) // 8
            Y = 2 * ((m + 13 * (2 * k + s)) % 64) + 64
            Cb = 2 * ((2 * m + 7 * k) % 64) + 64
            Cr = 2 * ((3 * m + 5 * k) % 64) + 64
            want = np.clip(
                [
                    np.floor(Y + 1.402 * (Cr - 128.0) + 0.5),
                    np.floor(
                        Y
                        - 0.344136 * (Cb - 128.0)
                        - 0.714136 * (Cr - 128.0)
                        + 0.5
                    ),
                    np.floor(Y + 1.772 * (Cb - 128.0) + 0.5),
                ],
                0,
                255,
            )
            assert (px[y, x] == want).all(), (y, x)
    # the two Y sub-blocks really land side by side: distinct DCs change
    # the luma across the 8-pixel boundary within one MCU row
    k0y = [2 * ((m + 13 * s) % 64) + 64 for s in range(2)]
    assert len(set(k0y)) == 2
    # partial-MCU 4:2:2 is legal since round 12; a wrong MCU count
    # (24x16 -> ceil(24/16)*2 = 4 MCUs) still raises
    with pytest.raises(ValueError):
        jpeg_encode_ycbcr_422(mcus[:1], 24, 16)


def test_jpeg_progressive_equals_baseline_pixels():
    """The six-scan progressive stream must decode to EXACTLY the same
    pixels as the baseline encoding of the same quantized coefficients
    — across AC densities (EOB runs, ZRL, refinement correction bits),
    gray and 4:4:4 color, and a two-round successive approximation."""
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_encode_progressive,
        jpeg_encode_ycbcr,
    )

    rng = np.random.RandomState(4242)

    def rand_block(density, lo=-40, hi=40):
        blk = [0] * 64
        blk[0] = int(rng.randint(-60, 60))
        for k in range(1, 64):
            if rng.rand() < density:
                v = 0
                while v == 0:
                    v = int(rng.randint(lo, hi))
                blk[k] = v
        return blk

    for trial in range(12):
        w, h = 8 * rng.randint(1, 5), 8 * rng.randint(1, 5)
        nb = (w // 8) * (h // 8)
        density = [0.0, 0.05, 0.3, 0.9][trial % 4]
        blocks = [rand_block(density) for _ in range(nb)]
        base = jpeg_decode(jpeg_encode_gray([list(b) for b in blocks], w, h))
        prog = jpeg_decode(
            jpeg_encode_progressive([list(b) for b in blocks], w, h)
        )
        assert np.array_equal(base, prog), (trial, w, h, density)
    for trial in range(6):
        w, h = 8 * rng.randint(1, 4), 8 * rng.randint(1, 4)
        nb = (w // 8) * (h // 8)
        density = [0.0, 0.15, 0.6][trial % 3]
        mcus = [tuple(rand_block(density) for _ in range(3)) for _ in range(nb)]
        base = jpeg_decode(jpeg_encode_ycbcr(list(mcus), w, h))
        prog = jpeg_decode(jpeg_encode_progressive(list(mcus), w, h))
        assert np.array_equal(base, prog), (trial, w, h, density)
    # deeper successive approximation: two AC/DC refinement rounds
    for _ in range(4):
        blocks = [rand_block(0.4, -100, 100) for _ in range(6)]
        base = jpeg_decode(jpeg_encode_gray([list(b) for b in blocks], 24, 16))
        prog = jpeg_decode(
            jpeg_encode_progressive([list(b) for b in blocks], 24, 16, al=2)
        )
        assert np.array_equal(base, prog)


def test_jpeg_progressive_scope_and_validation():
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    with pytest.raises(ValueError):
        jpeg_encode_progressive([[0] * 64], 12, 8)  # not multiple of 8
    with pytest.raises(ValueError):
        jpeg_encode_progressive([[0] * 64], 8, 8, al=0)
    # subsampled progressive is IN scope since round 11: a header-only
    # 4:2:0 SOF2 stream (no DQT, no scans) is malformed, not
    # unsupported (pixel-exact decode covered in
    # tests/test_multimodal_animated.py)
    import struct

    app0 = b"\xff\xe0" + struct.pack(
        ">H5sHBHHBB", 16, b"JFIF\x00", 0x0102, 0, 72, 72, 0, 0
    )
    sof2_420 = b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="undeclared quant table"):
        jpeg_decode(b"\xff\xd8" + app0 + sof2_420 + b"\xff\xd9")
    # non-integer-ratio progressive sampling is IN scope since round
    # 13: a header-only stream is malformed, not unsupported
    sof2_frac = b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 48, 48, 3) + bytes(
        [1, 0x31, 0, 2, 0x21, 1, 3, 0x11, 1]
    )
    with pytest.raises(ValueError, match="undeclared quant table"):
        jpeg_decode(b"\xff\xd8" + app0 + sof2_frac + b"\xff\xd9")


def test_png16_round_trips_and_scope():
    import numpy as np

    rng = np.random.RandomState(3)
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for interlace in (False, True):
            px = rng.randint(0, 65536, size=(13, 9, ch)).astype(np.uint16)
            back = multimodal.png_decode(
                multimodal.png_encode(
                    px, color_type=ct, interlace=interlace, depth=16
                )
            )
            assert back.dtype == np.uint16 and (back == px).all(), (
                ct,
                interlace,
            )
    # every filter type isolated at depth 16
    for f in range(5):
        px = rng.randint(0, 65536, size=(6, 7, 3)).astype(np.uint16)
        back = multimodal.png_decode(
            multimodal.png_encode(px, color_type=2, depth=16, filters=[f])
        )
        assert (back == px).all(), f
    # spec/scope guards: no 16-bit palettes, sub-8 depths still pinned
    idx = np.zeros((3, 3, 1), dtype=np.uint16)
    with pytest.raises(ValueError, match="depth <= 8"):
        multimodal.png_encode(idx, color_type=3, palette=[(1, 2, 3)], depth=16)
    with pytest.raises(ValueError):
        multimodal.png_encode(idx, color_type=2, depth=4)
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # every spec depth (1/2/4/8/16) is now in scope; a non-spec depth
    # is the remaining rejection path
    ihdr3 = struct.pack(">IIBBBBB", 4, 4, 3, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="depth=3"):
        multimodal.png_decode(
            sig + chunk(b"IHDR", ihdr3) + chunk(b"IEND", b"")
        )


def test_jpeg_cmyk_decode_closed_form_and_ycck_pin():
    import numpy as np

    from polars_trading_spark.functions.multimodal import (
        decode_image,
        jpeg_decode,
        jpeg_encode_cmyk,
    )

    gens = ((1, 13), (2, 7), (3, 5), (4, 11))
    for m in (0, 7, 23):
        w, h = 8 * (1 + m % 6), 8 * (1 + m % 4)
        nb = (w // 8) * (h // 8)
        mcus = []
        for k in range(nb):
            blks = []
            for a, b in gens:
                blk = [0] * 64
                blk[0] = ((a * m + b * k) % 64) - 32
                blks.append(blk)
            mcus.append(tuple(blks))
        pay = jpeg_encode_cmyk(mcus, w, h)
        fmt, dw, dh, px = decode_image(pay)
        assert (fmt, dw, dh) == ("jpeg", w, h)
        assert px.shape == (h, w, 4)
        bw = w // 8
        for k in range(nb):
            by, bx = k // bw, k % bw
            for ci, (a, b) in enumerate(gens):
                expect = 2 * ((a * m + b * k) % 64) + 64
                assert (
                    px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci] == expect
                ).all(), (m, k, ci)
    # flipping the Adobe transform byte to 2 reinterprets the SAME
    # entropy stream as YCCK (round 11): the decode applies the BT.601
    # inverse + libjpeg complement to planes 0-2 and keeps K as stored
    import math as _math

    ycck = bytearray(pay)
    adobe_at = ycck.index(b"Adobe")
    ycck[adobe_at + 11] = 2
    px_y = jpeg_decode(bytes(ycck))
    assert px_y.shape == (h, w, 4)
    bw = w // 8
    for k in range(nb):
        by, bx = k // bw, k % bw
        yv, cb, cr, kv = (2 * ((a * m + b * k) % 64) + 64 for a, b in gens)
        r = min(255, max(0, _math.floor(yv + 1.402 * (cr - 128) + 0.5)))
        g = min(255, max(0, _math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
        b_ = min(255, max(0, _math.floor(yv + 1.772 * (cb - 128) + 0.5)))
        blkpx = px_y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        for ci, want in enumerate((255 - r, 255 - g, 255 - b_, kv)):
            assert (blkpx[:, :, ci] == want).all(), (m, k, ci)
    # AC coefficients also ride the 4-plane scan (not just DC-only)
    mcus_ac = []
    for k in range(nb):
        blks = []
        for ci in range(4):
            blk = [0] * 64
            blk[0] = (7 * k + ci) % 32 - 16
            blk[1] = (k + ci) % 9 - 4
            blk[8] = (3 * k) % 7 - 3
            blks.append(blk)
        mcus_ac.append(tuple(blks))
    px_ac = jpeg_decode(jpeg_encode_cmyk(mcus_ac, w, h))
    assert px_ac.shape == (h, w, 4)


def test_png_sub8_round_trips_and_scope():
    import numpy as np

    rng = np.random.RandomState(5)
    pal = [(i * 16, 255 - i * 16, (i * 37) % 256) for i in range(16)]
    # gray depths 1/2/4: all filters, sequential and Adam7
    for d in (1, 2, 4):
        for interlace in (False, True):
            smp = rng.randint(0, 1 << d, size=(13, 11)).astype(np.uint8)
            back = multimodal.png_decode(
                multimodal.png_encode(
                    smp, color_type=0, depth=d, interlace=interlace
                )
            )
            assert back.shape == (13, 11, 1) and (
                back[:, :, 0] == smp
            ).all(), (d, interlace)
        for f in range(5):
            smp = rng.randint(0, 1 << d, size=(6, 17)).astype(np.uint8)
            back = multimodal.png_decode(
                multimodal.png_encode(smp, color_type=0, depth=d, filters=[f])
            )
            assert (back[:, :, 0] == smp).all(), (d, f)
    # palette at depths 4/2/1 maps through PLTE (incl. interlace)
    for d, npal in ((4, 16), (2, 4), (1, 2)):
        idx = rng.randint(0, npal, size=(9, 14, 1)).astype(np.uint8)
        for interlace in (False, True):
            back = multimodal.png_decode(
                multimodal.png_encode(
                    idx,
                    color_type=3,
                    palette=pal[:npal],
                    depth=d,
                    interlace=interlace,
                )
            )
            expect = np.array(pal[:npal], dtype=np.uint8)[
                idx[:, :, 0].astype(np.int64)
            ]
            assert (back == expect).all(), (d, interlace)
    # spec guards: out-of-range sample, sub-8 truecolor
    with pytest.raises(ValueError, match="out of range"):
        multimodal.png_encode(
            np.full((3, 3), 4, np.uint8), color_type=0, depth=2
        )
    with pytest.raises(ValueError, match="color types 0 or 3"):
        multimodal.png_encode(np.zeros((3, 3, 3), np.uint8), color_type=2, depth=4)
