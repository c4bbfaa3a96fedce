from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_reporting_spark.llm.dedup import (
    exact_dedup_map,
    jaccard_pairs,
    minhash_near_duplicates,
    shingle_docs,
    simhash_signatures,
)
from etl_reporting_spark.llm.multimodal import decode_media_metadata, with_binary_payload
from etl_reporting_spark.llm.similarity import cosine_topk_bruteforce
from etl_reporting_spark.llm.textstats import document_fingerprint, language_id, text_quality


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river shore"),  # near-dup of 0
        (2, "completely different text with other words entirely unrelated to anything"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_map(spark):
    out = exact_dedup_map(_docs(spark)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[3]["canonical_id"] == 0 and by_id[3]["group_size"] == 2
    assert by_id[0]["canonical_id"] == 0
    assert by_id[2]["group_size"] == 1


def test_shingles_and_jaccard(spark):
    sh = shingle_docs(_docs(spark), k=3)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()}
    assert pairs[(0, 3)] == 1.0  # exact dup
    assert 0.5 < pairs[(0, 1)] < 1.0  # near dup (one word differs)
    assert (0, 2) not in pairs  # unrelated docs share no trigram


def test_minhash_lsh_finds_planted_near_dup(spark):
    out = {(r["doc_a"], r["doc_b"]) for r in minhash_near_duplicates(_docs(spark)).collect()}
    assert (0, 3) in out  # identical docs always collide in every band
    assert (0, 1) in out  # high-jaccard pair: all bands should collide here too


def test_simhash_identical_docs_equal(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[3]
    assert -(2**63) <= sigs[0] < 2**63  # 64-bit signature in two's complement
    assert sigs[0] != sigs[2]


def test_jaccard_max_df_drops_hot_shingles(spark):
    """A boilerplate shingle shared by all n docs emits n(n-1)/2 pairs
    through the inverted-index self-join; max_df must stop it before
    the join (AQE can split partitions but cannot shrink pair count)."""
    # 30 docs: identical 3-token boilerplate prefix (one hot shingle),
    # otherwise pairwise-disjoint tokens.
    rows = [(i, "common boiler plate " + " ".join(f"u{i}v{j}" for j in range(6)))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_docs(docs, k=3)
    uncapped = jaccard_pairs(sh).count()
    assert uncapped == 30 * 29 // 2  # every pair shares the hot shingle
    capped = jaccard_pairs(sh, max_df=5)
    assert capped.count() == 0  # hot shingle (df=30) filtered pre-join
    # default stays uncapped: dedup_ngram_jaccard gate semantics unchanged
    assert jaccard_pairs(sh, max_df=None).count() == uncapped


def test_incremental_screen_cleanup_handle(spark):
    """Per-batch callers must be able to release every frame the
    operator persisted (the increment's shingle arrays AND the
    candidate pairs): the cleanup list receives exactly the persisted
    frames, and unpersisting them leaves nothing cached (the streaming
    screen does this after every sink)."""
    from etl_reporting_spark.llm.dedup import incremental_near_duplicates

    docs = _docs(spark)
    cleanup = []
    pairs = incremental_near_duplicates(
        docs.filter("doc_id < 2"), docs.filter("doc_id >= 2"), cleanup=cleanup
    )
    pairs.count()
    assert len(cleanup) == 2 and all(df.is_cached for df in cleanup)
    for df in cleanup:
        df.unpersist()
    assert not any(df.is_cached for df in cleanup)


def test_simhash_blocking_bounds_candidates(spark):
    """16-bit blocks (65,536 values each) must keep random-doc
    candidate volume near zero — the scale property the 64-bit
    construction exists for. 120 mutually-unrelated docs have 7,140
    possible pairs; unrelated 64-bit simhashes should almost never
    share a 16-bit block, so the bound here is a loose 1%."""
    from etl_reporting_spark.llm.dedup import simhash_candidate_pairs

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_signatures(docs)
    n_cand = simhash_candidate_pairs(sigs).count()
    assert n_cand <= 71  # ≤1% of all pairs; nibble blocking gave ~12%+


def test_cosine_topk_known_geometry(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2, 3]
    cos1 = next(r["cosine"] for r in out if r["neighbor_id"] == 1)
    assert math.isclose(cos1, 0.9 / math.sqrt(0.81 + 0.01), rel_tol=1e-6)


def test_text_quality_and_language(spark):
    docs = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "el que la de y en un")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert q[0]["n_tokens"] == 5
    assert q[0]["stopword_ratio"] == 3 / 5  # the, and, the
    lang = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    assert lang[0] == "en" and lang[1] == "es"


def test_fingerprint_collides_only_for_identical(spark):
    fp = {r["doc_id"]: r["fingerprint"] for r in document_fingerprint(_docs(spark)).collect()}
    assert fp[0] == fp[3]
    assert fp[0] != fp[2]


def test_multimodal_fake_decode(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: r for r in decode_media_metadata(with_binary_payload(docs)).collect()}
    text0 = docs.filter(F.col("doc_id") == 0).first()["text"]
    assert out[0]["n_bytes"] == len(text0.encode())
    assert out[0]["fake_width"] == len(text0.encode()) % 640 + 16
    assert out[0]["media_kind"] == "image" and out[1]["media_kind"] == "audio"


def test_simhash_near_duplicates_pairs(spark):
    from etl_reporting_spark.llm.dedup import simhash_near_duplicates

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_near_duplicates(_docs(spark), max_hamming=3).collect()}
    assert pairs.get((0, 3)) == 0  # identical docs: distance 0
    assert all(h <= 3 for h in pairs.values())


def test_cosine_topk_ivf_matches_bruteforce_in_cluster(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.similarity import cosine_topk_ivf

    rows = [(i, [float(i == j) * 0.9 + 0.1 for j in range(4)]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk_ivf(emb, emb.filter(F.col("vec_id") == 9), k=3, n_centroids=4)
    got = [r["neighbor_id"] for r in sorted(out.collect(), key=lambda r: r["rank"])]
    assert len(got) >= 1 and 9 not in got  # excludes self, searches its cluster


def test_embedding_near_dup_lsh_subset_of_exact(spark):
    from etl_reporting_spark.llm.similarity import embedding_near_duplicates

    # 0/1 nearly identical, 2/3 nearly identical, others far apart
    rows = [
        (0, [1.0] * 8),
        (1, [1.0] * 7 + [0.9]),
        (2, [-1.0] * 8),
        (3, [-1.0] * 7 + [-0.9]),
        (4, [1.0, -1.0] * 4),
        (5, [-1.0, 1.0] * 4),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(emb, 0.95, method="exact").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            emb, 0.95, method="lsh", bands=6, planes_per_band=2, dim=8
        ).collect()
    }
    assert exact == {(0, 1), (2, 3)}
    assert lsh <= exact  # LSH candidates verified exactly: never a false positive
    assert (0, 1) in lsh  # identical-direction vectors always share every bucket


def test_hash_split_deterministic_under_repartition(spark):
    from etl_reporting_spark.llm.sampling import with_hash_split

    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in with_hash_split(df, w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in with_hash_split(df.repartition(7, "doc_id"), w).collect()
    }
    assert a == b  # membership is a pure function of the id, not the layout
    counts = {s: sum(1 for v in a.values() if v == s) for s in w}
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0
    assert abs(counts["train"] / 2000 - 0.8) < 0.05


def test_hash_split_weights_must_sum_to_one(spark):
    import pytest

    from etl_reporting_spark.llm.sampling import with_hash_split

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        with_hash_split(df, {"a": 0.5, "b": 0.4})


def test_deterministic_sample_incremental_consistency(spark):
    # Adding new rows never changes old rows' membership — the property
    # that makes hash sampling safe for incremental 100 TB pipelines.
    from pyspark.sql import functions as F

    from etl_reporting_spark.llm.sampling import deterministic_sample

    small = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    kept_small = {r["doc_id"] for r in deterministic_sample(small, 0.3).collect()}
    kept_big = {r["doc_id"] for r in deterministic_sample(big, 0.3).collect()}
    assert kept_small == {d for d in kept_big if d < 500}


def test_stratified_sample_keeps_full_stratum(spark):
    from etl_reporting_spark.llm.sampling import stratified_sample

    rows = [(i, "keep" if i % 2 == 0 else "cut") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", {"keep": 1.0, "cut": 0.0})
    got = {r["doc_id"] for r in out.collect()}
    assert got == {i for i in range(200) if i % 2 == 0}


def test_repetition_stats_crafted_doc(spark):
    from etl_reporting_spark.llm.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z w"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert 3 not in out  # single-token doc excluded
    r1 = out[1]  # tokens: a b a b c; 2-grams: 'a b','b a','a b','b c'
    assert r1["n_tokens"] == 5 and r1["n_distinct_tokens"] == 3
    assert r1["top_2gram_count"] == 2
    assert abs(r1["dup_token_fraction"] - 0.4) < 1e-12
    assert abs(r1["dup_2gram_fraction"] - 0.25) < 1e-12
    assert abs(r1["top_2gram_fraction"] - 0.5) < 1e-12
    r2 = out[2]
    assert r2["dup_token_fraction"] == 0.0 and r2["top_2gram_count"] == 1


def test_pii_redaction_crafted(spark):
    from etl_reporting_spark.llm.redact import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@corp.example.org now"),
            (2, "server 192.168.0.1 and ssn 123-45-6789"),
            (3, "call (555) 867-5309 or 555-867-5309"),
            (4, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["redacted_text"] == "mail <EMAIL> now" and out[1]["n_email"] == 1
    assert out[2]["redacted_text"] == "server <IP> and ssn <SSN>"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_ssn"] == 1
    assert out[3]["redacted_text"] == "call <PHONE> or <PHONE>" and out[3]["n_phone"] == 2
    assert out[4]["n_pii_total"] == 0 and out[4]["redacted_text"] == out[4]["redacted_text"]


def test_pack_documents_boundary_fill(spark):
    from pyspark.sql import functions as F

    from etl_reporting_spark.llm.sampling import pack_documents

    # single shard so the packing order is just doc_id
    rows = [(1, 300), (2, 300), (3, 300), (4, 700)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = {r["doc_id"]: r for r in pack_documents(df, 512, shards=1).collect()}
    # starts: 0, 300, 600, 900 -> packs 0, 0, 1, 1
    base = out[1]["pack_id"] - 0
    assert [out[i]["pack_id"] - base for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert out[1]["pack_offset"] == 0
    assert out[2]["pack_offset"] == 300  # overruns the 512 boundary by design
    assert out[3]["pack_offset"] == 600 - 512
    # deterministic under repartition
    again = {
        r["doc_id"]: r["pack_id"]
        for r in pack_documents(df.repartition(5), 512, shards=1).collect()
    }
    assert again == {k: v["pack_id"] for k, v in out.items()}


def test_multimodal_resize_frames_features(spark):
    from etl_reporting_spark.llm.multimodal import (
        extract_features,
        resize_media,
        sample_frames,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(0, "a" * 1000), (1, "b" * 300), (2, "c" * 10)], "doc_id long, text string"
    )
    wp = with_binary_payload(docs)

    resized = {r["doc_id"]: r for r in resize_media(wp, width=8, height=8).collect()}
    assert all(len(r["resized_payload"]) == 64 for r in resized.values())
    assert resized[2]["resized_payload"] == b"c" * 64  # tiled up to target

    frames = sample_frames(wp, frame_bytes=256, every_nth=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # doc 0: 1000//256 = 3 frames -> keep idx 0, 2; doc 2: 1 frame
    assert sorted(by_doc[0]) == [0, 2]
    assert by_doc[2] == [0]

    feats = {r["doc_id"]: r["embedding"] for r in extract_features(wp, dim=4).collect()}
    assert len(feats[0]) == 4 and abs(sum(feats[0]) - 1.0) < 1e-6
    # deterministic: same payload -> same vector
    again = {r["doc_id"]: r["embedding"] for r in extract_features(wp, dim=4).collect()}
    assert feats == again


def test_kmeans_step_moves_centroids_to_cluster_means(spark):
    from etl_reporting_spark.llm.similarity import kmeans_step, kmeans_step_components

    # two tight direction-clusters; seeds = one member of each
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.95, 0.05]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [0.05, 0.95]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = emb.filter("vec_id IN (0, 3)")
    comp = {
        (r["centroid_id"], r["pos"]): r
        for r in kmeans_step_components(emb, seeds).collect()
    }
    assert comp[(0, 0)]["n_members"] == 3 and comp[(3, 0)]["n_members"] == 3
    assert abs(comp[(0, 0)]["mean_val"] - (1.0 + 0.9 + 0.95) / 3) < 1e-6
    assert abs(comp[(3, 1)]["mean_val"] - (1.0 + 0.9 + 0.95) / 3) < 1e-6

    # array form chains: a second iteration runs off the first's output
    c1 = kmeans_step(emb, seeds)
    c2 = kmeans_step(emb, c1)
    got = {r["vec_id"]: r["embedding"] for r in c2.collect()}
    assert len(got) == 2 and all(len(v) == 2 for v in got.values())
    # stable assignment -> identical means in iteration 2
    c1_map = {r["vec_id"]: r["embedding"] for r in c1.collect()}
    for k in got:
        assert all(abs(a - b) < 1e-9 for a, b in zip(got[k], c1_map[k]))


def test_kmeans_exact_means_skewed_cluster_scalar_state(spark):
    """Round-15 memory bound (verdict item 7): exact means aggregate
    per-(centroid, pos) SCALAR components, never whole member vectors
    per centroid — a deliberately skewed assignment (every vector in
    ONE cluster) keeps per-group aggregation state at cluster_size
    scalars instead of cluster_size × dim doubles, and the ordered
    fold still matches the id-ascending sequential sum exactly."""
    from etl_reporting_spark.llm.similarity import kmeans_step_components

    dim, n = 8, 50
    rows = [(i, [float(i) + 0.25 * p for p in range(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one far-away seed: every vector lands in centroid 0 (the hot
    # cluster a 100 TB run would OOM on under the vector-collect form)
    seeds = spark.createDataFrame(
        [(0, [100.0] * dim)], "vec_id long, embedding array<float>"
    )
    comps = kmeans_step_components(emb, seeds, exact=True)
    # component form is visible at the API: one row per (centroid, pos)
    got = {(r["centroid_id"], r["pos"]): r for r in comps.collect()}
    assert len(got) == dim and all(r["n_members"] == n for r in got.values())
    # bit-exact ordered fold per component (same doubles, same order)
    for p in range(dim):
        acc = 0.0
        for i in range(n):  # id-ascending member order
            acc += float(np_float32(float(i) + 0.25 * p))
        assert got[(0, p)]["mean_val"] == acc / n
    # the aggregation input is posexploded scalars, never whole vectors
    plan = comps._jdf.queryExecution().executedPlan().toString()
    assert "posexplode" in plan or "PosExplode" in plan


def np_float32(x: float) -> float:
    import struct as _struct

    return _struct.unpack("f", _struct.pack("f", x))[0]


def test_curate_corpus_all_reasons(spark):
    from etl_reporting_spark.llm.curate import curate_corpus

    good = "the quick brown fox jumps over a lazy dog and then " * 3  # 33 tokens, varied
    docs = spark.createDataFrame(
        [
            (1, good + "unique one"),
            (2, good + "unique one"),       # exact duplicate of 1 -> 'duplicate'
            (3, "tiny doc"),                # -> too_short
            (4, "w " * 200 + "end"),        # 201 tokens -> too_long (checked first? no: repetitive later)
            (5, good + "mail me a@b.co"),   # -> has_pii
            (6, good + "unique six"),       # survivor
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curate_corpus(docs, max_dup_2gram=0.9).collect()}
    assert out[1]["reject_reason"] is None and out[1]["split"] is not None
    assert out[2]["reject_reason"] == "duplicate" and out[2]["split"] is None
    assert out[3]["reject_reason"] == "too_short"
    assert out[4]["reject_reason"] == "too_long"
    assert out[5]["reject_reason"] == "has_pii"
    assert out[6]["reject_reason"] is None
    # repetitive fires when the threshold is tight
    rep = {r["doc_id"]: r["reject_reason"] for r in curate_corpus(docs, max_tokens=500, max_dup_2gram=0.01).collect()}
    assert rep[4] == "repetitive"


def test_cross_doc_contamination(spark):
    from etl_reporting_spark.llm.dedup import cross_doc_contamination

    docs = spark.createDataFrame(
        [
            (1, "shared prefix words then alpha beta gamma"),
            (2, "shared prefix words then delta epsilon zeta"),
            (3, "completely different content lives here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cross_doc_contamination(docs, k=3).collect()}
    # docs 1/2 share the shingles inside "shared prefix words then"
    assert out[1]["n_shared"] == 2 and out[2]["n_shared"] == 2
    assert out[3]["n_shared"] == 0 and out[3]["contamination"] == 0.0
    assert 0 < out[1]["contamination"] < 1


def test_decontaminate_against_flags_leaked_doc(spark):
    from etl_reporting_spark.llm.dedup import decontaminate_against

    bench = spark.createDataFrame(
        [(100, "the exact benchmark question appears here verbatim")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the exact benchmark question appears here verbatim with extra words"),
            (2, "totally original training material nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate_against(corpus, bench, max_overlap=0.5).collect()}
    assert out[1]["contaminated"] == 1 and out[1]["benchmark_overlap"] > 0.5
    assert out[2]["contaminated"] == 0 and out[2]["n_overlap"] == 0


def test_chunk_documents_overlap(spark):
    import pytest as _pytest

    from etl_reporting_spark.llm.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = sorted(chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
                  key=lambda r: r["chunk_idx"])
    texts = [r["chunk_text"] for r in rows]
    assert texts[0] == "w0 w1 w2 w3"
    assert texts[1] == "w2 w3 w4 w5"      # 2-token overlap
    assert texts[-1].split()[-1] == "w9"  # tail covered
    assert rows[-1]["n_chunk_tokens"] <= 4
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_train_ivf_centroids_and_query(spark):
    from etl_reporting_spark.llm.similarity import cosine_topk_ivf, train_ivf_centroids

    rows = [(i, [1.0 - 0.01 * i, 0.01 * i]) for i in range(4)] + [
        (i, [0.01 * (i - 4), 1.0 - 0.01 * (i - 4)]) for i in range(4, 8)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(emb, n_centroids=2, iterations=3)
    got = cents.collect()
    assert len(got) == 2 and all(len(r["embedding"]) == 2 for r in got)
    out = cosine_topk_ivf(emb, emb.filter("vec_id = 0"), k=2, centroids=cents)
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert neighbors <= {1, 2, 3}  # same-direction cluster only


def test_connected_components_chain_triangle_and_convergence(spark):
    """A 4-node chain (needs >1 propagation round), a triangle, and an
    isolated pair must all resolve to min-id component labels."""
    from etl_reporting_spark.llm.cluster import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (edges given high-to-low so the min label must
        # travel the full diameter), triangle 10-11-12, pair 20-21
        [(4, 3), (3, 2), (2, 1), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # driver union-find fast path (default size gate)
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == expected
    # distributed propagation (gate disabled)
    comp_dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert comp_dist == expected


def test_star_components_match_propagation(spark):
    """algorithm='star' must produce the identical labelling on the
    chain + triangle + pair graph, and release its cache through the
    cleanup handle."""
    from etl_reporting_spark.llm.cluster import connected_components

    pairs = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    cleanup = []
    comp = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, algorithm="star", cleanup=cleanup, driver_max_edges=0
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert len(cleanup) == 1 and cleanup[0].is_cached
    cleanup[0].unpersist()
    assert not cleanup[0].is_cached


def test_star_components_path_graph_logarithmic_rounds(spark):
    """The adversarial case the star algorithm exists for: a 1024-node
    path (serial-scrape shape). Min-label propagation needs
    diameter≈1023 rounds — far past its 25-round guard — while
    large-star/small-star must converge in O(log n) alternations and
    label every node with the path's minimum."""
    from etl_reporting_spark.llm.cluster import _star_components

    n = 1024
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = _star_components(pairs)
    assert rounds <= 24  # ~2·log2(1024) alternation bound, with slack
    comp = {r["node"]: r["component"] for r in labels.collect()}
    assert len(comp) == n and set(comp.values()) == {0}
    labels.unpersist()


def test_near_duplicate_clusters_singletons_and_canonicals(spark):
    """Every doc gets a verdict: cluster members share the min-id
    cluster, exactly one member is canonical, singletons self-cluster."""
    from etl_reporting_spark.llm.cluster import near_duplicate_clusters

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),          # near-dup of 1
            (3, "completely different words describing some other topic entirely here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in near_duplicate_clusters(docs, k=3, min_jaccard=0.5).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[2]["cluster_id"] == 1
    assert rows[1]["is_canonical"] and not rows[2]["is_canonical"]
    assert rows[1]["cluster_size"] == 2 and rows[2]["cluster_size"] == 2
    assert rows[3]["cluster_id"] == 3 and rows[3]["is_canonical"] and rows[3]["cluster_size"] == 1


def test_tfidf_top_terms_ranks_distinctive_terms(spark):
    """A term unique to one doc must outscore corpus-wide terms, ranks
    are dense 1..k with term-text tiebreak, and scores are the exact
    rational idf (no transcendental drift)."""
    from etl_reporting_spark.llm.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common common"),
            (3, "common filler words"),
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["term_rank"]): r for r in tfidf_top_terms(docs, k_top=2).collect()}
    top1 = out[(1, 1)]
    assert top1["term"] == "zebra" and top1["tf"] == 1 and top1["df"] == 1
    # rational idf: tf * ((N - df + 0.5) / (df + 0.5)) = 1 * (2.5/1.5)
    assert top1["score"] == 1.0 * ((3.0 - 1.0 + 0.5) / (1.0 + 0.5))
    # 'common' appears in all 3 docs -> idf (3-3+0.5)/(3+0.5), tf=3 for doc 2
    assert out[(2, 1)]["term"] == "common"
    assert out[(2, 1)]["score"] == 3.0 * ((3.0 - 3.0 + 0.5) / (3.0 + 0.5))


def test_vocab_top_terms_counts_and_order(spark):
    from etl_reporting_spark.llm.textstats import vocab_top_terms

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "b")],
        "doc_id long, text string",
    )
    rows = vocab_top_terms(docs, k_top=2).collect()
    assert [(r["term"], r["total_tf"], r["doc_freq"]) for r in rows] == [
        ("b", 3, 3),
        ("a", 2, 1),
    ]


def test_incremental_screen_uses_store_and_skips_corpus_internal(spark):
    """The increment screen must find corpus↔new and new↔new dups, skip
    corpus-internal ones, and accept a precomputed signature store
    (the production path — corpus text only re-read for candidates)."""
    from etl_reporting_spark.llm.dedup import (
        incremental_near_duplicates,
        minhash_signatures,
        shingle_docs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base), (2, base + " lambda"), (3, "totally unrelated words here for filler")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base + " mu"), (11, base + " mu nu")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_near_duplicates(corpus, new, min_jaccard=0.5).collect()
    }
    assert (1, 2) not in out          # corpus-internal: already resolved
    assert (1, 10) in out and (10, 11) in out  # corpus↔new and new↔new

    # precomputed store gives identical results
    store = minhash_signatures(shingle_docs(corpus))
    out2 = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_near_duplicates(
            corpus, new, corpus_signatures=store, min_jaccard=0.5
        ).collect()
    }
    assert out2 == out


def test_span_dedup_detects_shared_runs(spark):
    """Two docs sharing a verbatim 11-token run (≥ window) must both
    report a duplicated span at stride 1 regardless of alignment; a doc with unique text
    reports zero."""
    from etl_reporting_spark.llm.dedup import duplicated_span_stats, span_hashes

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"
    rows = [
        (1, shared + " unique tail one two three four five six"),
        (2, "different head words here then " + shared),
        (3, "entirely distinct content with no overlap at all whatsoever present"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in
             duplicated_span_stats(docs, window=8, stride=1).collect()}
    assert stats[1]["n_dup_spans"] >= 1
    assert stats[2]["n_dup_spans"] >= 1
    assert stats[3]["n_dup_spans"] == 0
    # the colliding span hash is the same verbatim window in both docs
    sp = span_hashes(docs, window=8, stride=1)
    dup = sp.filter("span_df >= 2").collect()
    assert {r["doc_id"] for r in dup} == {1, 2}


def test_span_dedup_short_docs_drop(spark):
    from etl_reporting_spark.llm.dedup import duplicated_span_stats

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    ids = {r["doc_id"] for r in duplicated_span_stats(docs, window=8, stride=1).collect()}
    assert ids == {2}


def test_semantic_dedup_flags_within_cluster_only(spark):
    from etl_reporting_spark.llm.similarity import semantic_dedup

    # Seeds 0/1 define two opposite clusters. 2 duplicates 0's
    # direction (same cluster, cosine ≈ 1 → dup), 3 duplicates 1's
    # (dup in the other cluster), 4 is orthogonal-ish to everything
    # in its cluster (kept). Min-id keep rule: seeds themselves stay.
    rows = [
        (0, [1.0] * 8),
        (1, [-1.0] * 8),
        (2, [1.0] * 7 + [0.9]),
        (3, [-1.0] * 7 + [-0.9]),
        (4, [1.0, -1.0] * 4),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_centroids=2, min_cosine=0.95).collect()}
    assert len(out) == 5  # one fate row per vector
    assert [out[i]["is_semantic_dup"] for i in range(5)] == [0, 0, 1, 1, 0]
    # dup pairs never cross clusters: 2 rides 0's cluster, 3 rides 1's
    assert out[2]["centroid_id"] == out[0]["centroid_id"]
    assert out[3]["centroid_id"] == out[1]["centroid_id"]


def test_phash_near_duplicates_planted_reencode(spark):
    from etl_reporting_spark.llm.multimodal import perceptual_hash, phash_near_duplicates

    # 0/1: same heavy buckets (a/b/c), tail differs by one byte — a
    # "re-encode"; 2: heavy buckets q/r/s — different shape entirely.
    base = b"abc" * 50 + b"xyz"
    near = b"abc" * 50 + b"xyw"
    far = b"qrs" * 50 + b"xyz"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, payload binary"
    )
    sigs = {r["doc_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert sigs[0] == sigs[1] != sigs[2]
    pairs = phash_near_duplicates(df, max_hamming=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}
    assert pairs[0]["hamming"] == 0


def test_mine_hard_negatives_excludes_planted_positive(spark):
    from etl_reporting_spark.llm.similarity import (
        cosine_topk_bruteforce,
        mine_hard_negatives,
    )

    # 10/11 share the query's direction (the labeled positive and the
    # hard negative); everything else is noise.
    rows = [(0, [1.0] * 8), (10, [1.0] * 7 + [0.9]), (11, [1.0] * 7 + [0.8])]
    rows += [(i, [float((i * 5 + j) % 7 - 3) for j in range(8)]) for i in range(1, 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id = 0")
    top = [r["neighbor_id"] for r in
           cosine_topk_bruteforce(emb, q, k=2).orderBy("rank").collect()]
    assert top == [10, 11]  # the positive IS the top hit
    positives = spark.createDataFrame([(0, 10)], "query_id long, pos_id long")
    neg = mine_hard_negatives(emb, q, positives, k=2).orderBy("neg_rank").collect()
    assert len(neg) == 2 and neg[0]["neighbor_id"] == 11  # next-best takes rank 1
    assert 10 not in {r["neighbor_id"] for r in neg}  # the positive is excluded
    assert neg[1]["neighbor_id"] in range(1, 8)  # rank 2 is a noise vector
    assert neg[0]["cosine"] > neg[1]["cosine"]  # re-rank preserves score order


def test_pack_bfd_beats_boundary_fill_and_is_stable(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.sampling import pack_documents, pack_documents_bfd

    # token lengths engineered so boundary fill wastes: 600,500,400,
    # 300×2, 200... BFD pairs them tightly under budget 1000
    rows = [(i, t) for i, t in enumerate([600, 500, 400, 300, 300, 200, 700, 100])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    bfd = pack_documents_bfd(df, 1000, shards=1)
    got = {r["doc_id"]: r for r in bfd.collect()}
    assert len(got) == 8  # every doc placed exactly once
    # no bin overruns its budget (no doc exceeds it here)
    assert all(r["bin_fill"] <= 1000 for r in got.values())
    n_bins_bfd = len({r["bin_idx"] for r in got.values()})
    assert n_bins_bfd == 4  # 3100 tokens within 1000-budget bins: optimal here is 4
    # NOTE: no general bin-count ordering vs pack_documents exists —
    # boundary fill OVERRUNS budgets (its count is ceil(total/budget),
    # a lower bound no budget-respecting packer can always match);
    # on this fixture both happen to pack 4.
    boundary = pack_documents(df, 1000, shards=1)
    assert boundary.select("pack_id").distinct().count() == 4
    # rerun + repartition stability
    again = pack_documents_bfd(df.repartition(5), 1000, shards=1)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in bfd.collect()}
    # oversized doc gets its own bin, never dropped
    big = spark.createDataFrame([(1, 5000), (2, 10)], "doc_id long, n_tokens long")
    bg = {r["doc_id"]: r for r in pack_documents_bfd(big, 1000, shards=1).collect()}
    assert bg[1]["bin_fill"] == 5000 and bg[1]["bin_idx"] != bg[2]["bin_idx"]


def test_leakage_safe_split_keeps_clusters_together(spark):
    from etl_reporting_spark.llm.sampling import leakage_safe_split

    out = leakage_safe_split(
        _docs(spark), {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # 0/1/3 form one near-dup cluster: ALL must share one split
    assert by_id[0]["cluster_id"] == by_id[1]["cluster_id"] == by_id[3]["cluster_id"]
    assert by_id[0]["split"] == by_id[1]["split"] == by_id[3]["split"]
    assert by_id[2]["cluster_size"] == 1  # the unrelated doc stands alone


def test_normalize_text_merges_stylistic_variants(spark):
    from etl_reporting_spark.llm.textstats import normalize_text

    rows = [
        (0, "The Fox’s “Great” Plan — now!"),
        (1, "the  fox's \"great\" plan - NOW"),
        (2, "entirely different"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()}
    assert got[0] == got[1] == "the fox s great plan now"
    assert got[2] == "entirely different"


def test_ivf_multiprobe_recall_superset(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.similarity import cosine_topk_bruteforce, cosine_topk_ivf

    rows = [(i, [float((i * 13 + j * 7) % 11 - 5) for j in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 20)
    exact = [r["neighbor_id"] for r in cosine_topk_bruteforce(emb, q, k=5).orderBy("rank").collect()]

    def recall(n_probe):
        got = {r["neighbor_id"] for r in
               cosine_topk_ivf(emb, q, k=5, n_centroids=6, n_probe=n_probe).collect()}
        return len(got & set(exact))

    r1, r3, r6 = recall(1), recall(3), recall(6)
    assert r1 <= r3 <= r6          # more probes never lose recall
    assert r6 == 5                 # probing every cell == exact top-5

