"""Text-operator semantics pinned beyond the oracle: rolling-fingerprint
determinism and collision behavior, dedup family ground truth on the
synthesized duplicate corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_spark.llm.dedup import corpus_with_dups, dedup_exact, dedup_ngram_jaccard
from hive_2_spark.llm.text import fingerprint_rolling
from tests.conftest import SF_DIR


def test_rolling_fingerprint_deterministic_and_discriminative(spark):
    a = {r["doc_id"]: r["rfp"] for r in fingerprint_rolling(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["rfp"] for r in fingerprint_rolling(spark, SF_DIR).collect()}
    assert a == b  # stable across runs
    assert all(0 <= v < 1_000_000_007 for v in a.values())
    # 500 distinct docs should yield (near-)distinct fingerprints
    assert len(set(a.values())) > 490


def test_dedup_exact_finds_all_synthesized_twins(spark):
    groups = dedup_exact(spark, SF_DIR).collect()
    # seeds (doc_id % 10 == 0) have an exact twin at +20M: 50 pairs at
    # sf0.001; near twins (+' suffix') hash differently
    twins = [g for g in groups if g["n_copies"] == 2]
    singles = [g for g in groups if g["n_copies"] == 1]
    assert len(twins) == 50
    assert all(g["keep_id"] < 1_000_000 for g in twins)  # original kept
    assert len(singles) == 500 - 50 + 50  # uniques + near-twin variants


def test_simhash_semantics(spark):
    """Exact twins hash identically; near twins (one extra word) stay
    within a small Hamming radius; the 16-bit bands catch them."""
    from hive_2_spark.llm.dedup import dedup_simhash

    rows = {r["doc_id"]: r for r in dedup_simhash(spark, SF_DIR).collect()}
    ham_near, band_hits = [], 0
    for seed in range(0, 500, 10):
        orig, exact, near = rows[seed], rows[seed + 20_000_000], rows[seed + 10_000_000]
        assert orig["simhash_hex"] == exact["simhash_hex"]  # identical content
        ham = bin(
            int(orig["simhash_hex"], 16) ^ int(near["simhash_hex"], 16)
        ).count("1")
        ham_near.append(ham)
        bands_match = sum(
            orig[f"band{i}"] == near[f"band{i}"] for i in range(8)
        )
        if bands_match >= 1:
            band_hits += 1
        # pigeonhole GUARANTEE: 8 bands of 8 bits always catch ham <= 7
        if ham <= 7:
            assert bands_match >= 1, (seed, ham)
    # most near twins are near (a few short docs flip wholesale)
    assert sorted(ham_near)[len(ham_near) // 2] <= 7, ham_near
    # measured: 74% of twins at ham<=7 -> band recall must be >= 0.7
    assert band_hits / len(ham_near) >= 0.7, band_hits


def test_ngram_jaccard_catches_near_twins(spark):
    pairs = dedup_ngram_jaccard(spark, SF_DIR).collect()
    got = {(r["a_id"], r["b_id"]) for r in pairs}
    # every seed must pair with its exact twin (jac == 1.0)
    for seed in range(0, 500, 10):
        assert (seed, seed + 20_000_000) in got
    # and with its near twin (one-word suffix -> jac just under 1);
    # restrict to original seeds — (near, exact) twins also differ by 10M
    near_hits = sum(
        1 for (a, b) in got if a < 1_000_000 and b == a + 10_000_000
    )
    assert near_hits == 50


def test_ngram_jaccard_block_cap_bounds_pair_space(spark):
    """The content-derived blocking must keep the candidate-pair space
    near-linear: sum over blocks of n*(n-1)/2 stays a small multiple of
    the corpus size, and the cap guard drops any degenerate block."""
    from hive_2_spark.llm.dedup import _BLOCK_CAP, _NORM

    c = corpus_with_dups(spark, SF_DIR).withColumn(
        "blk", F.md5(F.substring(_NORM(F.col("text")), 1, 32))
    )
    sizes = c.groupBy("blk", "lang").count()
    row = sizes.agg(
        F.max("count").alias("max_n"),
        F.sum(
            F.when(F.col("count") <= _BLOCK_CAP,
                   F.col("count") * (F.col("count") - 1) / 2).otherwise(0)
        ).alias("pairs"),
    ).collect()[0]
    total = c.count()
    # capped pair space is near-linear in corpus size, nowhere near n^2/2
    assert row["pairs"] <= 5 * total, (row["pairs"], total)
    # and the blocking key itself is content-derived: shifting every
    # doc_id must not change the block assignment
    shifted = c.withColumn("doc_id", F.col("doc_id") + 777)
    assert (
        shifted.select("blk").distinct().count()
        == c.select("blk").distinct().count()
    )


def test_text_chunk_overlap_and_coverage(spark):
    """Consecutive chunks of one doc overlap by exactly W-S tokens, and
    every token of the doc appears in at least one chunk."""
    from hive_2_spark.llm.text import _CHUNK_S, _CHUNK_W, text_chunk

    chunks = (
        text_chunk(spark, SF_DIR)
        .filter("doc_id = 0")
        .orderBy("chunk_start")
        .collect()
    )
    assert chunks, "doc 0 produced no chunks"
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur.chunk_start - prev.chunk_start == _CHUNK_S
        prev_words = prev.chunk_text.split(" ")
        cur_words = cur.chunk_text.split(" ")
        overlap = _CHUNK_W - _CHUNK_S
        assert prev_words[-overlap:] == cur_words[:overlap]
    # coverage: reassembling non-overlapping prefixes gives the doc back
    doc = (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .filter("doc_id = 0")
        .first()
        .text
    )
    rebuilt = chunks[0].chunk_text.split(" ")
    for c in chunks[1:]:
        rebuilt.extend(c.chunk_text.split(" ")[_CHUNK_W - _CHUNK_S:])
    assert rebuilt == doc.split(" ")


def test_token_pack_capacity_bound(spark):
    """No pack exceeds capacity unless a single document already does;
    pack ids are dense from 0 within each language."""
    from hive_2_spark.llm.text import _PACK_CAP, token_pack

    rows = token_pack(spark, SF_DIR).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, packs in by_lang.items():
        ids = sorted(p.pack_id for p in packs)
        assert ids == list(range(len(ids))), f"{lang}: sparse pack ids"
        for p in packs:
            # a doc can straddle the boundary it starts before; the
            # greedy rule bounds a pack by capacity + one doc's tokens
            assert p.pack_tokens < 2 * _PACK_CAP, f"{lang}: runaway pack"


def test_minhash_portable_recall_on_planted_twins(spark):
    """Exact twins (identical text -> identical signature) MUST all be
    candidates; near twins (one-word suffix edit) at >=95% recall — the
    banded miss probability is (1-(1-p)^2)^4 with p ~ 2/|shingles|."""
    from hive_2_spark.llm.dedup import corpus_with_dups, dedup_minhash_portable

    pairs = {
        (r.a_id, r.b_id)
        for r in dedup_minhash_portable(spark, SF_DIR).collect()
    }
    seeds = [
        r.doc_id
        for r in corpus_with_dups(spark, SF_DIR)
        .filter("doc_id % 10 = 0 AND doc_id < 10000000")
        .select("doc_id")
        .collect()
    ]
    assert seeds
    exact_found = sum((s, s + 20_000_000) in pairs for s in seeds)
    near_found = sum((s, s + 10_000_000) in pairs for s in seeds)
    assert exact_found == len(seeds)  # guaranteed by construction
    assert near_found / len(seeds) >= 0.95


def test_minhash_lsh_recall_on_planted_twins(spark):
    """The rows-only pyspark.ml MinHashLSH key's substitute gate
    (OPERATORS.md rows-only table): planted exact twins (identical
    text, Jaccard distance 0) MUST all surface as candidate pairs;
    near twins (one-word suffix edit, distance well under the 0.2
    join threshold) at >=95% recall across the 5 hash tables."""
    from hive_2_spark.llm.dedup import corpus_with_dups, dedup_minhash_lsh

    pairs = {
        (r.a_id, r.b_id)
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    seeds = [
        r.doc_id
        for r in corpus_with_dups(spark, SF_DIR)
        .filter("doc_id % 10 = 0 AND doc_id < 10000000")
        .select("doc_id")
        .collect()
    ]
    assert seeds
    exact_found = sum((s, s + 20_000_000) in pairs for s in seeds)
    near_found = sum((s, s + 10_000_000) in pairs for s in seeds)
    assert exact_found == len(seeds), f"{exact_found}/{len(seeds)}"
    assert near_found / len(seeds) >= 0.95, f"{near_found}/{len(seeds)}"


def test_split_assign_is_pure_function_and_80_20ish(spark):
    """Split must be derivable from doc_id alone (same doc -> same split
    on every call) and land near the 80/20 target on the fixture."""
    from hive_2_spark.llm.curation import curation_split_assign

    a = curation_split_assign(spark, SF_DIR).collect()
    b = {r["doc_id"]: r["split"] for r in curation_split_assign(spark, SF_DIR).collect()}
    assert all(r["split"] == b[r["doc_id"]] for r in a)
    n = len(a)
    train = sum(1 for r in a if r["split"] == "train")
    assert 0.7 <= train / n <= 0.9, train / n


def test_split_leakage_audit_is_nonvacuous_and_consistent(spark):
    """The fixture corpus plants near-dup twins whose hash buckets
    straddle the split, so the train-val (leakage) class must be
    non-empty; class pair counts must sum to the full pair set."""
    from hive_2_spark.llm.curation import curation_split_leakage
    from hive_2_spark.llm.dedup import dedup_ngram_jaccard

    rows = {r["pair_class"]: r for r in
            curation_split_leakage(spark, SF_DIR).collect()}
    assert "train-val" in rows and rows["train-val"]["n_pairs"] > 0
    total_pairs = sum(r["n_pairs"] for r in rows.values())
    assert total_pairs == dedup_ngram_jaccard(spark, SF_DIR).count()
    for r in rows.values():  # a pair touches exactly 2 docs
        assert r["n_docs"] <= 2 * r["n_pairs"]
