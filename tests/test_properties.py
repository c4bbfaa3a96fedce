"""Property-based tests: operator semantics vs brute-force Python
oracles over randomized inputs (bounded example counts — each example
runs a Spark job)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_reporting_spark.functions.datetime_fns import working_days_between
from etl_reporting_spark.operators.cdc import asof_join, dedup_latest
from etl_reporting_spark.operators.merge import merge_upsert

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

dates = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 31))


@SLOW
@given(pairs=st.lists(st.tuples(dates, dates), min_size=1, max_size=20))
def test_working_days_matches_python(spark, pairs):
    df = spark.createDataFrame(pairs, "s date, e date")
    got = [r["w"] for r in df.select(working_days_between(F.col("s"), F.col("e")).alias("w"))
           .collect()]
    for (s, e), w in zip(pairs, got):
        if e < s:
            assert w == 0
        else:
            expected = sum(
                1 for i in range((e - s).days + 1) if (s + dt.timedelta(days=i)).weekday() < 5
            )
            assert w == expected, (s, e, w, expected)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_latest_matches_python(spark, rows):
    # (key, seq_a, seq_b): latest = max by (seq_a, seq_b) per key
    df = spark.createDataFrame(rows, "k int, a int, b int")
    got = {r["k"]: (r["a"], r["b"]) for r in dedup_latest(df, "k", ["a", "b"]).collect()}
    expected = {}
    for k, a, b in rows:
        if k not in expected or (a, b) > expected[k]:
            expected[k] = (a, b)
    assert got == expected


@SLOW
@given(
    build=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=15),
    probe=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=15),
)
def test_asof_join_matches_python(spark, build, probe):
    build_rows = [(k, t, f"v{k}_{t}_{i}") for i, (k, t) in enumerate(build)]
    probe_rows = [(k, t, i) for i, (k, t) in enumerate(probe)]
    b = spark.createDataFrame(build_rows or [(99, -1, "sentinel")], "k int, t int, val string")
    p = spark.createDataFrame(probe_rows, "k int, t int, pid int")
    out = asof_join(p, b, "k", "t", "t", build_cols=["val"], tie_break=["val"])
    got = {r["pid"]: r["val"] for r in out.collect()}
    for k, t, pid in probe_rows:
        cands = [(bt, v) for (bk, bt, v) in (build_rows or [(99, -1, "sentinel")])
                 if bk == k and bt <= t]
        expected = max(cands, key=lambda c: (c[0], c[1]))[1] if cands else None
        assert got[pid] == expected, (k, t, pid, got[pid], expected)


@SLOW
@given(
    target=st.dictionaries(st.integers(0, 8), st.integers(0, 100), max_size=8),
    source=st.dictionaries(st.integers(0, 8), st.integers(0, 100), max_size=8),
    delete=st.booleans(),
)
def test_merge_upsert_matches_python(spark, target, source, delete):
    t = spark.createDataFrame(list(target.items()) or [(-1, 0)], "k int, v int")
    s = spark.createDataFrame(list(source.items()) or [(-2, 0)], "k int, v int")
    tgt = dict(target) or {-1: 0}
    src = dict(source) or {-2: 0}
    res = merge_upsert(t, s, ["k"], delete_not_matched_by_source=delete)
    got = {r["k"]: r["v"] for r in res.df.collect()}
    expected = {}
    for k, v in tgt.items():
        if k in src:
            expected[k] = src[k]
        elif not delete:
            expected[k] = v
    for k, v in src.items():
        if k not in tgt:
            expected[k] = v
    assert got == expected
    assert res.rows_inserted == len([k for k in src if k not in tgt])
    assert res.rows_updated == len([k for k in src if k in tgt])
    assert res.rows_deleted == (len([k for k in tgt if k not in src]) if delete else 0)


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
def test_jaccard_pairs_match_python(spark, docs):
    from etl_reporting_spark.llm.dedup import jaccard_pairs, shingle_docs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_docs(df, k=3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()}

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for i, ta in rows:
        for j, tb in rows:
            if i < j:
                sa, sb = shingles(ta), shingles(tb)
                inter = len(sa & sb)
                if inter:
                    expected = inter / len(sa | sb)
                    assert abs(got[(i, j)] - expected) < 1e-12
                else:
                    assert (i, j) not in got


@SLOW
@given(
    dim=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(25, 50)),
        min_size=1, max_size=8,
    ),
    facts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60)), min_size=1, max_size=10
    ),
)
def test_interval_join_matches_python(spark, dim, facts):
    import datetime as dt

    from etl_reporting_spark.operators.cdc import interval_join

    base = dt.date(2024, 1, 1)
    d = dt.timedelta
    dim_rows = [
        (k, i, base + d(days=lo), base + d(days=hi)) for i, (k, lo, hi) in enumerate(dim)
    ]
    fact_rows = [(k, base + d(days=t), i) for i, (k, t) in enumerate(facts)]
    ddf = spark.createDataFrame(dim_rows, "k int, version int, eff date, exp date")
    fdf = spark.createDataFrame(fact_rows, "k int, event_dt date, fact_id int")
    out = interval_join(fdf, ddf, "k", "event_dt", "eff", "exp", inclusive_end=True)
    got = sorted((r["fact_id"], r["version"]) for r in out.collect())
    expected = sorted(
        (fi, vi)
        for (fk, ft, fi) in fact_rows
        for (dk, vi, lo, hi) in dim_rows
        if fk == dk and lo <= ft <= hi
    )
    assert got == expected


@SLOW
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True))
def test_hash_split_partitions_ids(spark, ids):
    """Every id gets exactly one label, labels come from the weight
    keys, and membership is identical however the data arrives."""
    from etl_reporting_spark.llm.sampling import with_hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    rows = with_hash_split(df, w).collect()
    assert len(rows) == len(ids)
    assert {r["split"] for r in rows} <= set(w)
    again = {r["doc_id"]: r["split"] for r in with_hash_split(df.repartition(3), w).collect()}
    assert again == {r["doc_id"]: r["split"] for r in rows}


@SLOW
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 900)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(100, 1000),
)
def test_pack_documents_invariants(spark, docs, budget):
    """Offsets stay inside the budget, packs within a shard are
    non-decreasing in id order, and each pack's start is exact."""
    from etl_reporting_spark.llm.sampling import pack_documents

    df = spark.createDataFrame(docs, "doc_id long, n_tokens int")
    rows = pack_documents(df, budget, shards=4).collect()
    assert len(rows) == len(docs)
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        assert 0 <= r["pack_offset"] < budget
        prev = by_shard.get(r["shard"])
        if prev is not None:
            assert r["pack_id"] >= prev
        by_shard[r["shard"]] = r["pack_id"]


@SLOW
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True))
def test_deterministic_sample_monotone_in_fraction(spark, ids):
    from etl_reporting_spark.llm.sampling import deterministic_sample

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    small = {r["doc_id"] for r in deterministic_sample(df, 0.2).collect()}
    big = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    assert small <= big  # growing the fraction only adds rows


@SLOW
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "c"]), min_size=0, max_size=12),
    pair=st.tuples(st.sampled_from(["a", "b", "ab", "c"]), st.sampled_from(["a", "b", "ab", "c"])),
)
def test_merge_pair_matches_python_greedy(spark, syms, pair):
    """merge_pair_column ≡ the reference greedy left-to-right
    non-overlapping merge (including ambiguous alphabets where the
    merged symbol collides with an existing one, e.g. 'a'+'b'='ab')."""
    from etl_reporting_spark.llm.tokenize import merge_pair_column

    a, b = pair
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    df = spark.createDataFrame([(syms,)], "symbols array<string>")
    got = df.select(merge_pair_column(F.col("symbols"), a, b).alias("m")).first()["m"]
    assert got == out, (syms, pair, got, out)


@SLOW
@given(
    values=st.lists(st.integers(0, 10_000), min_size=1, max_size=200),
    k=st.sampled_from([4, 16, 64]),
)
def test_kmv_matches_python_construction(spark, values, k):
    """KMV sketch ≡ Python md5 reference: same k smallest 32-bit
    hashes, same estimate arithmetic, exact below k."""
    import hashlib

    from etl_reporting_spark.llm.corpusops import kmv_distinct

    df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
        "grp", F.lit("g")
    )
    row = kmv_distinct(df, "grp", "v", k=k).first()
    hashes = sorted(
        {int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) for v in values}
    )
    top = hashes[:k]
    assert row["n_kept"] == len(top)
    if len(top) < k:
        assert row["exact"] is True and row["est_distinct"] == float(len(top))
    else:
        assert row["exact"] is False
        assert row["est_distinct"] == (k - 1) / (top[-1] / 2**32)


@SLOW
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["nav", "foot", "x", "y", "z w"]), min_size=0, max_size=5),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.sampled_from([2, 3]),
)
def test_remove_frequent_lines_matches_python(spark, texts, min_docs):
    """Line dedup ≡ Python reference: doc-frequency vote (one vote per
    doc), threshold, order-preserving reassembly, totality."""
    from collections import Counter

    from etl_reporting_spark.llm.corpusops import remove_frequent_lines

    docs = [(i, "\n".join(lines)) for i, lines in enumerate(texts)]
    votes = Counter()
    for _, text in docs:
        for line in set(text.split("\n")):
            if line:
                votes[line] += 1
    bp = {l for l, n in votes.items() if n >= min_docs}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in remove_frequent_lines(df, min_docs=min_docs).collect()
    }
    assert len(got) == len(docs)
    for i, text in docs:
        lines = [l for l in text.split("\n") if l]
        kept = [l for l in lines if l not in bp]
        assert got[i]["text"] == "\n".join(kept), (i, text)
        assert got[i]["n_lines_kept"] == len(kept)
        assert got[i]["n_lines_removed"] == len(lines) - len(kept)


@SLOW
@given(
    corpus=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                    min_size=1, max_size=40),
    probes=st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                    min_size=1, max_size=15),
)
def test_countmin_never_undercounts(spark, corpus, probes):
    from collections import Counter

    from etl_reporting_spark.llm.corpusops import countmin_estimate, countmin_sketch

    df = spark.createDataFrame([(t,) for t in corpus], "term string")
    pr = spark.createDataFrame([(t,) for t in set(probes)], "term string")
    sk = countmin_sketch(df, "term", depth=3, width=32)
    est = {r["term"]: r["cm_estimate"] for r in
           countmin_estimate(sk, pr, "term", depth=3, width=32).collect()}
    truth = Counter(corpus)
    total = len(corpus)
    for t in set(probes):
        assert truth[t] <= est[t] <= total  # CM invariant: never under, never past N


@SLOW
@given(
    members=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8),
                     min_size=1, max_size=40),
    probes=st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=8),
                    min_size=1, max_size=15),
)
def test_bloom_never_false_negative(spark, members, probes):
    from etl_reporting_spark.llm.corpusops import bloom_build, bloom_contains

    df = spark.createDataFrame([(t,) for t in members], "term string")
    pr = spark.createDataFrame([(t,) for t in set(probes) | set(members)], "term string")
    bloom = bloom_build(df, "term", m_bits=1024, k=4)
    got = {r["term"]: r["bloom_member"] for r in
           bloom_contains(bloom, pr, "term", m_bits=1024, k=4).collect()}
    for t in set(members):
        assert got[t] == 1  # membership NEVER missed, any input


@SLOW
@given(
    hosts=st.lists(
        st.lists(st.sampled_from(["a", "b", "cc", "dd"]), min_size=1, max_size=4),
        min_size=1, max_size=20,
    ),
    blocked=st.lists(
        st.lists(st.sampled_from(["a", "b", "cc", "dd"]), min_size=1, max_size=3),
        min_size=1, max_size=5,
    ),
)
def test_blocklist_matches_python_suffix_rule(spark, hosts, blocked):
    from etl_reporting_spark.llm.urls import apply_domain_blocklist

    urls = [(i, "https://" + ".".join(h) + "/p") for i, h in enumerate(hosts)]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    bl = spark.createDataFrame([(".".join(b),) for b in blocked], "domain string")
    got = {r["doc_id"]: r["blocked"] for r in apply_domain_blocklist(df, bl).collect()}
    bset = {".".join(b) for b in blocked}
    for i, h in enumerate(hosts):
        # python oracle: blocked iff some label-suffix of the host is listed
        suffixes = {".".join(h[j:]) for j in range(len(h))}
        assert got[i] == (1 if suffixes & bset else 0), (h, bset)


@SLOW
@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50), st.sampled_from("ABC")),
        min_size=1, max_size=40,
    )
)
def test_funnel_matches_python_first_touch(spark, events):
    import datetime as dt

    from etl_reporting_spark.operators.analytics import funnel

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), t)
        for u, m, t in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["stage"]: r["n_users"] for r in funnel(df, ["A", "B", "C"]).collect()}

    def first_at_or_after(u, t, lo):
        cand = [ts for uu, ts, tt in rows if uu == u and tt == t and ts >= lo]
        return min(cand) if cand else None

    import datetime as dt2
    zero = dt2.datetime(1900, 1, 1)
    exp = {"A": 0, "B": 0, "C": 0}
    for u in {e[0] for e in events}:
        a = first_at_or_after(u, "A", zero)
        if a is None:
            continue
        exp["A"] += 1
        b = first_at_or_after(u, "B", a)
        if b is None:
            continue
        exp["B"] += 1
        if first_at_or_after(u, "C", b) is not None:
            exp["C"] += 1
    assert got == exp


@SLOW
@given(
    old=st.dictionaries(st.integers(0, 15), st.integers(0, 3), max_size=12),
    new=st.dictionaries(st.integers(0, 15), st.integers(0, 3), max_size=12),
)
def test_table_diff_matches_python(spark, old, new):
    from etl_reporting_spark.operators.relational import table_diff

    o = spark.createDataFrame([(k, v) for k, v in old.items()] or [(None, None)],
                              "k long, v long").filter("k IS NOT NULL")
    n = spark.createDataFrame([(k, v) for k, v in new.items()] or [(None, None)],
                              "k long, v long").filter("k IS NOT NULL")
    got = {r["k"]: r["diff_status"] for r in table_diff(o, n, "k").collect()}
    exp = {}
    for k in set(old) | set(new):
        if k not in old:
            exp[k] = "added"
        elif k not in new:
            exp[k] = "removed"
        elif old[k] != new[k]:
            exp[k] = "changed"
        else:
            exp[k] = "unchanged"
    assert got == exp


# ---------------------------------------------------------- image codecs

@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    """decode(encode(x)) == x for arbitrary shapes/contents — pure
    Python, no Spark job per example, so the budget is generous."""
    import numpy as np

    from etl_reporting_spark.llm import imagecodec as ic

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    assert np.array_equal(ic.decode_png(ic.encode_png(arr)), arr)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 2**31 - 1))
def test_bmp_ppm_roundtrip_property(h, w, seed):
    import numpy as np

    from etl_reporting_spark.llm import imagecodec as ic

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(arr)), arr)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(arr)), arr)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SLOW
@given(
    names=st.lists(
        st.text(alphabet="abcdef ", min_size=1, max_size=14),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    max_edit=st.integers(1, 2),
)
def test_fuzzy_dedup_matches_bruteforce(spark, names, max_edit):
    """The recall claim, adversarially random: q-gram blocking + the
    short-string length pass together must find EXACTLY the pairs the
    n² python levenshtein finds — including strings below the
    (k+1)·q lemma floor and whitespace-heavy inputs (no df cap here:
    the cap is a documented recall trade, not part of the claim)."""
    from etl_reporting_spark.operators.fuzzy import fuzzy_dedup_pairs

    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_dedup_pairs(
            df, "id", "name", max_edit=max_edit, max_df=None
        ).collect()
    }
    expected = {}
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            d = _lev(a, names[j])
            if d <= max_edit:
                expected[(i, j)] = d
    assert got == expected


@SLOW
@given(
    names=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=6),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    max_edit=st.integers(1, 2),
)
def test_fuzzy_dedup_short_heavy_corpus(spark, names, max_edit):
    """Round-7: the short pass rewritten from length buckets (an
    effective cross join — quadratic in the short population) to
    SymSpell deletion-neighborhood blocking. This corpus is 100%
    sub-lemma-length over a 2-letter alphabet — every pair rides the
    short pass, lengths collide constantly, and empty strings are in
    play — and recall must still be EXACTLY the n² levenshtein set."""
    from etl_reporting_spark.operators.fuzzy import fuzzy_dedup_pairs

    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_dedup_pairs(
            df, "id", "name", max_edit=max_edit, max_df=None
        ).collect()
    }
    expected = {}
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            d = _lev(a, names[j])
            if d <= max_edit:
                expected[(i, j)] = d
    assert got == expected


@SLOW
@given(
    left=st.lists(st.text(alphabet="abc", min_size=1, max_size=7),
                  min_size=1, max_size=8, unique=True),
    right=st.lists(st.text(alphabet="abc", min_size=1, max_size=7),
                   min_size=1, max_size=8, unique=True),
)
def test_fuzzy_join_short_keys_complete(spark, left, right):
    """fuzzy_join had NO short pass before round-7 — short×short
    matches were silently missed. Verified pairs (best_only=False)
    must now equal the brute-force product filter."""
    from etl_reporting_spark.operators.fuzzy import fuzzy_join

    ldf = spark.createDataFrame(list(enumerate(left)), "lid long, lname string")
    rdf = spark.createDataFrame(list(enumerate(right)), "rid long, rname string")
    got = {
        (r["left_id"], r["right_id"]): r["edit_distance"]
        for r in fuzzy_join(
            ldf, rdf, "lname", "rname", "lid", "rid",
            max_edit=2, max_df=None, best_only=False,
        ).collect()
    }
    expected = {}
    for i, a in enumerate(left):
        for j, b in enumerate(right):
            d = _lev(a, b)
            if d <= 2:
                expected[(i, j)] = d
    assert got == expected


@SLOW
@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    q=st.sampled_from([0.25, 0.5, 0.9]),
)
def test_global_sampled_quantiles_exact_when_corpus_fits(spark, values, q):
    """Corpora ≤ k get the exact interpolated percentile — the sample
    IS the corpus, so the result must equal numpy's linear
    interpolation on any input."""
    import numpy as np

    from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "doc_id long, score double"
    )
    got = global_sampled_quantiles(
        df, "score", "doc_id", {"t": q}, k=256
    ).collect()[0]["t"]
    assert got == pytest_approx(np.percentile(values, q * 100, method="linear"))


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-12, abs=1e-9)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    days=st.lists(st.integers(0, 59), min_size=4, max_size=24),
    lo_off=st.integers(0, 59),
    width=st.integers(0, 30),
)
def test_era_union_prune_matches_bruteforce(spark, tmp_path_factory, days, lo_off, width):
    """Spec evolution (round-12): for random rows split across a
    days()-era and a months()-era, read_pruned over any range equals
    the brute-force filter of the full read — era-union pruning plus
    the residual filter is exact, never lossy."""
    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    base = dt.date(2026, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=d)) for i, d in enumerate(days)
    ]
    cut = len(rows) // 2
    df0 = spark.createDataFrame(rows[: cut or 1], "id int, ds date")
    tmp = tmp_path_factory.mktemp("eraprune")
    t = create_hidden_partitioned_wap_table(
        spark, str(tmp / "t"), df0, ["days(ds)"]
    )
    t.evolve_partition_spec(["months(ds)"])
    if rows[cut or 1:]:
        t.append_rows(
            spark.createDataFrame(rows[cut or 1:], "id int, ds date")
        )
    lo = base + dt.timedelta(days=lo_off)
    hi = lo + dt.timedelta(days=width)
    got = sorted(
        r["id"] for r in t.read_pruned("ds", lo=lo, hi=hi).collect()
    )
    want = sorted(
        i for i, d in enumerate(days)
        if lo <= base + dt.timedelta(days=d) <= hi
    )
    assert got == want, (lo, hi, got, want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=12
    ),
    n_renames=st.integers(1, 4),
)
def test_rename_chain_preserves_values(
    spark, tmp_path_factory, vals, n_renames
):
    """RENAME (round-12): any chain of renames with appends in
    between reads back every row's value under the final name —
    name-chain resolution never NULLs or crosses wires."""
    from etl_reporting_spark.operators.wap import (
        create_partitioned_wap_table,
    )

    tmp = tmp_path_factory.mktemp("renamechain")
    names = ["v0", "v1", "v2", "v3", "v4"]
    df0 = spark.createDataFrame(
        [(0, "s", float(vals[0]))], f"id int, seg string, {names[0]} double"
    )
    t = create_partitioned_wap_table(spark, str(tmp / "t"), df0, ["seg"])
    expected = {0: float(vals[0])}
    for step in range(1, n_renames + 1):
        t.alter_schema(rename={names[step - 1]: names[step]})
        # append one row per remaining value under the NEW name
        if step < len(vals):
            t.append_rows(
                spark.createDataFrame(
                    [(step, "s", float(vals[step]))],
                    f"id int, seg string, {names[step]} double",
                )
            )
            expected[step] = float(vals[step])
    final = names[n_renames]
    got = {r["id"]: r[final] for r in t.read().collect()}
    assert got == expected
