"""DuckDB oracle twins for the LLM-pipeline queries.

Shared CTE fragments rebuild the exact same md5-based constructions
the Spark operators use (hash-as-permutation MinHash, hex-arithmetic
SimHash, ordered double-fold dot products, md5-parity hyperplanes),
so value hashes match bit-for-bit — including the approximate-ANN
paths, which are deterministic by construction.
"""

from __future__ import annotations

_SHINGLES = """
d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM d),
sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM idx
)
"""

_MINHASH_COLS = ",\n".join(
    f"  MIN(md5('{i}|' || shingle)) AS h{i}" for i in range(12)
)

_BANDS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, md5(h{3*b} || h{3*b+1} || h{3*b+2}) AS sig FROM sig"
    for b in range(4)
)

# Ordered double fold — mirrors the Spark aggregate() exactly (see
# similarity.py). list_reduce has no init, but IEEE `0.0 + v == v`,
# so starting from the first element is equivalent.
_DOT9 = (
    "list_reduce(list_transform(range(1, len({a}) + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, v) -> acc + v)"
)

# Hyperplane sign fold — mirrors similarity._hyperplane_sign: weight
# +x when the first hex char of md5('<plane>|<dim>') is even (by
# position in the hex alphabet), -x otherwise; bucket bit = sum > 0.
_HP_SIGN = (
    "CASE WHEN list_reduce(list_transform(range(1, len({v}) + 1),"
    " i -> CASE WHEN strpos('0123456789abcdef',"
    " substring(md5('{p}|' || CAST(i - 1 AS VARCHAR)), 1, 1)) % 2 = 0"
    " THEN CAST({v}[i] AS DOUBLE) ELSE -CAST({v}[i] AS DOUBLE) END),"
    " (acc, x) -> acc + x) > 0 THEN '1' ELSE '0' END"
)

_STOP_ALL = (
    "['the','a','and','of','to','in','is','it','that','for',"
    "'el','la','de','que','y','en','un','los','se','por',"
    "'le','les','des','une','du','est',"
    "'der','die','das','und','ist','von','mit','den','ein','zu']"
)
# NOTE: the combined list above would deduplicate overlaps ('la','de',
# 'un') — the Spark side builds the flat concatenation, and isin() only
# tests membership, so duplicates are harmless there; the oracle list
# must simply contain the same member SET. 'la','de','un' appear once.

LLM_ORACLE_SQL: dict[str, str] = {}

LLM_ORACLE_SQL["dedup_exact_groups"] = """
WITH hashed AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
groups AS (
  SELECT text_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
  FROM hashed GROUP BY 1
)
SELECT h.doc_id, h.text_hash, g.canonical_id, g.group_size
FROM hashed h JOIN groups g USING (text_hash)
ORDER BY h.doc_id
"""

LLM_ORACLE_SQL["dedup_minhash_lsh"] = f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id,
{_MINHASH_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
{_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
SELECT c.doc_a, c.doc_b,
  CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
FROM cand c
JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.5
ORDER BY c.doc_a, c.doc_b
"""

LLM_ORACLE_SQL["text_tfidf_topterms"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
t AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
),
d AS (SELECT term, COUNT(*) AS df FROM t GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
    CAST(t.tf AS DOUBLE) * (
      (CAST(n.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
      / (CAST(d.df AS DOUBLE) + 0.5)
    ) AS score
  FROM t JOIN d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC
  ) AS term_rank
  FROM scored
)
SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term, tf, df, score
FROM ranked WHERE term_rank <= 3
ORDER BY doc_id, term_rank
"""

LLM_ORACLE_SQL["dedup_incremental_screen"] = f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id,
{_MINHASH_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
{_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
-- sf-relative split: first 90% of docs play the standing corpus, the
-- last 10% the incoming daily batch (doc ids are dense from 0)
cutoff AS (SELECT (COUNT(*) * 9) // 10 AS c FROM documents)
SELECT c.doc_a, c.doc_b,
  CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
FROM cand c
JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.5
  AND c.doc_b >= (SELECT c FROM cutoff)  -- pairs touching the increment
ORDER BY c.doc_a, c.doc_b
"""

# The store path produces the identical pair set — only WHO computes
# the corpus signatures differs (precomputed store vs in-query
# fallback), which an output oracle cannot and need not distinguish.
LLM_ORACLE_SQL["dedup_incremental_screen_store"] = LLM_ORACLE_SQL["dedup_incremental_screen"]

LLM_ORACLE_SQL["text_vocab_head"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
t AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
)
SELECT term,
  CAST(SUM(tf) AS BIGINT) AS total_tf,
  COUNT(*) AS doc_freq
FROM t
GROUP BY term
ORDER BY total_tf DESC, term ASC
LIMIT 100
"""

LLM_ORACLE_SQL["dedup_cluster_resolution"] = f"""
WITH RECURSIVE {_SHINGLES},
sig AS (
  SELECT doc_id,
{_MINHASH_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
{_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.5
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach AS (
  SELECT s AS node, s AS x FROM edges
  UNION
  SELECT r.node, e.d AS x FROM reach r JOIN edges e ON e.s = r.x
),
comp AS (SELECT node, MIN(x) AS cluster_id FROM reach GROUP BY node),
csize AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
SELECT doc.doc_id,
  COALESCE(c.cluster_id, doc.doc_id) AS cluster_id,
  COALESCE(s2.cluster_size, 1) AS cluster_size,
  COALESCE(c.cluster_id, doc.doc_id) = doc.doc_id AS is_canonical
FROM documents doc
LEFT JOIN comp c ON c.node = doc.doc_id
LEFT JOIN csize s2 ON s2.cluster_id = c.cluster_id
ORDER BY doc.doc_id
"""

LLM_ORACLE_SQL["dedup_ngram_jaccard"] = f"""
WITH {_SHINGLES},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
SELECT i.doc_a, i.doc_b, i.n_common,
  CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.3
ORDER BY i.doc_a, i.doc_b
"""

# 64-bit simhash mirror: the per-token hash is the first 16 hex chars
# of md5(token), carried as two 32-bit halves (hi = chars 1-8 → global
# bits 32-63, lo = chars 9-16 → bits 0-31) so every intermediate fits
# a signed BIGINT. Signature assembly maps bit 63 through two's
# complement (−2^63), matching llm/dedup.py:simhash_signatures.
def _hex_to_int_sql(expr: str, start: int, n: int) -> str:
    out = "0"
    for i in range(n):
        out = (
            f"({out}) * 16"
            f" + strpos('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1"
        )
    return out


# ±1 bit-vote sums are intermediates compared only `> 0`, never
# projected, so HUGEINT vs BIGINT can't reach the output hash.
_BIT_SUMS = ",\n".join(
    "  /* lint: sum-ok */ SUM(CASE WHEN ("
    + (f"hv_lo >> {j}" if j < 32 else f"hv_hi >> {j - 32}")
    + f") & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(64)
)
_SIG_SUM = " + ".join(
    f"CASE WHEN s{j} > 0 THEN {-(2**63) if j == 63 else 2**j} ELSE 0 END" for j in range(64)
)

_SIMHASH_HV = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hv AS (
  SELECT doc_id,
    {_hex_to_int_sql('md5(tok)', 1, 8)} AS hv_hi,
    {_hex_to_int_sql('md5(tok)', 9, 8)} AS hv_lo
  FROM tok
),
sums AS (
  SELECT doc_id,
{_BIT_SUMS}
  FROM hv GROUP BY doc_id
)"""

LLM_ORACLE_SQL["dedup_simhash"] = f"""
{_SIMHASH_HV}
SELECT doc_id, CAST({_SIG_SUM} AS BIGINT) AS simhash
FROM sums ORDER BY doc_id
"""

LLM_ORACLE_SQL["ann_cosine_topk"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
    CAST({_DOT9.format(a='qvec', b='cvec')} AS DOUBLE)
      / (sqrt(CAST({_DOT9.format(a='qvec', b='qvec')} AS DOUBLE))
         * sqrt(CAST({_DOT9.format(a='cvec', b='cvec')} AS DOUBLE))) AS cosine
  FROM c, q WHERE neighbor_id != query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= 5
ORDER BY query_id, rank
"""

# Banded-LSH mirror of similarity.embedding_near_duplicates(method=
# "lsh", bands=12, planes_per_band=2): band b uses planes 2b, 2b+1.
_ND_BANDS, _ND_R = 12, 2
_ND_SIG_COLS = ",\n".join(
    "  "
    + " || ".join(_HP_SIGN.format(v="embedding", p=b * _ND_R + j) for j in range(_ND_R))
    + f" AS sig_{b}"
    for b in range(_ND_BANDS)
)
_ND_BAND_UNION = "\n  UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, sig_{b} AS sig FROM sigs" for b in range(_ND_BANDS)
)

LLM_ORACLE_SQL["emb_near_duplicates"] = f"""
WITH sigs AS (
  SELECT vec_id, embedding,
{_ND_SIG_COLS}
  FROM embeddings
),
bands AS (
  {_ND_BAND_UNION}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
),
e AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT c.id_a, c.id_b,
    CAST({_DOT9.format(a='ea.embedding', b='eb.embedding')} AS DOUBLE)
      / (sqrt(CAST({_DOT9.format(a='ea.embedding', b='ea.embedding')} AS DOUBLE))
         * sqrt(CAST({_DOT9.format(a='eb.embedding', b='eb.embedding')} AS DOUBLE))) AS cosine
  FROM cand c
  JOIN e ea ON ea.vec_id = c.id_a
  JOIN e eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.45
ORDER BY id_a, id_b
"""

LLM_ORACLE_SQL["text_quality_scores"] = f"""
WITH base AS (
  SELECT doc_id,
    CAST(length(text) AS INTEGER) AS n_chars,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
    CAST(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS INTEGER)
      AS n_punct,
    CAST(len(list_filter(string_split(text, ' '), t -> list_contains({_STOP_ALL}, t)))
      AS INTEGER) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
  CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
  CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
FROM base ORDER BY doc_id
"""

_LANG_LISTS = {
    "en": "['the','a','and','of','to','in','is','it','that','for']",
    "es": "['el','la','de','que','y','en','un','los','se','por']",
    "fr": "['le','la','de','et','les','des','un','une','du','est']",
    "de": "['der','die','das','und','ist','von','mit','den','ein','zu']",
}
_LANG_SCORES = ",\n".join(
    f"  CAST(len(list_filter(string_split(text, ' '), t -> list_contains({lst}, t)))"
    f" AS INTEGER) AS score_{lang}"
    for lang, lst in _LANG_LISTS.items()
)
_LANG_PRED = (
    "CASE WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lang} = greatest(score_en, score_es, score_fr, score_de) THEN '{lang}'"
        for lang in _LANG_LISTS
    )
    + " END"
)

LLM_ORACLE_SQL["text_language_id"] = f"""
WITH scores AS (
  SELECT doc_id,
{_LANG_SCORES}
  FROM documents
)
SELECT doc_id, score_en, score_es, score_fr, score_de,
  {_LANG_PRED} AS predicted_lang
FROM scores ORDER BY doc_id
"""

LLM_ORACLE_SQL["doc_fingerprints"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
hashes AS (
  SELECT doc_id,
    list_sort(list_transform(range(1, len(toks) - 1),
      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS hs
  FROM d
)
SELECT doc_id, md5(array_to_string(hs[1:4], '')) AS fingerprint
FROM hashes ORDER BY doc_id
"""

LLM_ORACLE_SQL["mm_decode_metadata"] = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS fake_width,
  CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INTEGER) AS fake_height,
  CAST(octet_length(encode(text)) % 3 + 1 AS INTEGER) AS fake_channels,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS media_kind
FROM documents ORDER BY doc_id
"""

LLM_ORACLE_SQL["dedup_simhash_pairs"] = f"""
{_SIMHASH_HV},
sig AS (SELECT doc_id, CAST({_SIG_SUM} AS BIGINT) AS simhash FROM sums),
blocks AS (
  SELECT doc_id, simhash, b.block, (simhash >> (16 * b.block)) & 65535 AS nib
  FROM sig, (SELECT unnest(range(0, 4)) AS block) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM blocks a JOIN blocks b
    ON a.block = b.block AND a.nib = b.nib AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(CAST(sig_a AS BIGINT), CAST(sig_b AS BIGINT))) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(CAST(sig_a AS BIGINT), CAST(sig_b AS BIGINT))) <= 3
ORDER BY doc_a, doc_b
"""

_COS = (
    "CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
)

LLM_ORACLE_SQL["ann_cosine_ivf"] = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='c.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='c.cvec', b='c.cvec'))} AS cosine
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
    FROM scored_assign
  ) t WHERE rn = 1
),
probes AS (SELECT * FROM assign WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
    {_COS.format(dot=_DOT9.format(a='q.embedding', b='a.embedding'),
                 na=_DOT9.format(a='q.embedding', b='q.embedding'),
                 nb=_DOT9.format(a='a.embedding', b='a.embedding'))} AS cosine
  FROM probes q JOIN assign a
    ON q.centroid_id = a.centroid_id AND a.vec_id != q.vec_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= 5
ORDER BY query_id, rank
"""

def _bucket_expr(v: str, planes: int = 4) -> str:
    return " || ".join(_HP_SIGN.format(v=v, p=p) for p in range(planes))


LLM_ORACLE_SQL["ann_cosine_lsh"] = f"""
WITH sigs AS (
  SELECT vec_id, embedding, {_bucket_expr('embedding')} AS bucket
  FROM embeddings
),
probes AS (SELECT * FROM sigs WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    CAST({_DOT9.format(a='q.embedding', b='c.embedding')} AS DOUBLE)
      / (sqrt(CAST({_DOT9.format(a='q.embedding', b='q.embedding')} AS DOUBLE))
         * sqrt(CAST({_DOT9.format(a='c.embedding', b='c.embedding')} AS DOUBLE))) AS cosine
  FROM probes q JOIN sigs c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= 5
ORDER BY query_id, rank
"""

LLM_ORACLE_SQL["text_token_stats"] = """
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS INTEGER)
      AS bpe_ish_tokens
  FROM documents
)
SELECT doc_id, ws_tokens, bpe_ish_tokens,
  CAST(bpe_ish_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE) AS tokens_per_word
FROM t ORDER BY doc_id
"""

# Deterministic hash bucket — mirrors sampling.hash_bucket: first 8
# md5 hex chars of the stringified id as a 32-bit int, mod buckets.
_HASH_BUCKET = "(('0x' || substring(md5(CAST({id} AS VARCHAR)), 1, 8))::BIGINT % {buckets})"

LLM_ORACLE_SQL["sample_hash_split"] = f"""
WITH b AS (
  SELECT *, {_HASH_BUCKET.format(id='doc_id', buckets=1000)} AS bucket FROM documents
),
labelled AS (
  SELECT *,
    CASE WHEN bucket < 800 THEN 'train'
         WHEN bucket < 900 THEN 'val'
         ELSE 'test' END AS split
  FROM b
)
SELECT split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,            -- lint: sum-ok (BIGINT cast)
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  MIN(doc_id) AS min_doc_id,
  MAX(doc_id) AS max_doc_id
FROM labelled GROUP BY split ORDER BY split
"""

LLM_ORACLE_SQL["sample_stratified"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, {_HASH_BUCKET.format(id='doc_id', buckets=100000)} AS bucket
  FROM documents
) t
WHERE bucket < (CASE source WHEN 'src0' THEN 100000 WHEN 'src1' THEN 25000 ELSE 50000 END)
ORDER BY doc_id
"""

# Gopher-style repetition signals — narrow list expressions mirroring
# textstats.repetition_stats: 2-grams via list_transform over range,
# distinct counts via list_distinct, top-2-gram count via a nested
# lambda (outer gram referenced inside the inner filter).
LLM_ORACLE_SQL["text_repetition"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
g AS (
  SELECT doc_id, toks,
    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS grams
  FROM d
),
c AS (
  SELECT doc_id,
    CAST(len(toks) AS INTEGER) AS n_tokens,
    CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
    CAST(len(grams) AS INTEGER) AS n_grams,
    CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct_grams,
    CAST(list_max(list_transform(list_distinct(grams),
      gg -> len(list_filter(grams, x -> x = gg)))) AS INTEGER) AS top_2gram_count
  FROM g
)
SELECT doc_id, n_tokens, n_distinct_tokens,
  CAST(1 AS DOUBLE) - CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_token_fraction,
  CAST(1 AS DOUBLE) - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_2gram_fraction,
  top_2gram_count,
  CAST(top_2gram_count AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_2gram_fraction
FROM c ORDER BY doc_id
"""

# PII redaction — mirrors redact.PII_PATTERNS applied in order (email,
# ipv4, ssn, phone); counts are measured at each stage so they sum to
# replacements made. DuckDB regexp_replace needs the 'g' flag to match
# Spark's replace-all default. The planted PII is the same doc_id
# arithmetic as the Spark query.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_PII_PHONE = r"\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"

LLM_ORACLE_SQL["text_pii_redaction"] = f"""
WITH salted AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 3 = 0 THEN text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
      WHEN doc_id % 3 = 1 THEN text || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-6789'
      ELSE text || ' call (555) 867-5309'
    END AS text
  FROM documents
),
s0 AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INTEGER) AS n_email,
    regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM salted
),
s1 AS (
  SELECT *, CAST(len(regexp_extract_all(t1, '{_PII_IPV4}')) AS INTEGER) AS n_ipv4,
    regexp_replace(t1, '{_PII_IPV4}', '<IP>', 'g') AS t2
  FROM s0
),
s2 AS (
  SELECT *, CAST(len(regexp_extract_all(t2, '{_PII_SSN}')) AS INTEGER) AS n_ssn,
    regexp_replace(t2, '{_PII_SSN}', '<SSN>', 'g') AS t3
  FROM s1
),
s3 AS (
  SELECT *, CAST(len(regexp_extract_all(t3, '{_PII_PHONE}')) AS INTEGER) AS n_phone,
    regexp_replace(t3, '{_PII_PHONE}', '<PHONE>', 'g') AS t4
  FROM s2
)
SELECT doc_id, t4 AS redacted_text, n_email, n_ipv4, n_ssn, n_phone,
  n_email + n_ipv4 + n_ssn + n_phone AS n_pii_total
FROM s3 ORDER BY doc_id
"""

# Boundary-fill packing — mirrors sampling.pack_documents: hash shard,
# running token sum per shard in doc_id order, pack = floor(start/512).
LLM_ORACLE_SQL["sample_pack_documents"] = f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
    {_HASH_BUCKET.format(id='doc_id', buckets=8).replace("md5(CAST(doc_id AS VARCHAR))", "md5('pack' || CAST(doc_id AS VARCHAR))")} AS shard
  FROM documents
),
r AS (
  SELECT *,
    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
  FROM t
)
SELECT doc_id, n_tokens, shard,
  shard * 4294967296 + CAST(floor(start / 512) AS BIGINT) AS pack_id,
  start - CAST(floor(start / 512) AS BIGINT) * 512 AS pack_offset
FROM r ORDER BY doc_id
"""

# media_kind tag — mirrors multimodal.with_binary_payload
_MEDIA_KIND = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' "
    "ELSE 'video' END"
)

# Resize fake: payload bytes tiled to width*height then truncated —
# text is ASCII so repeat+substring reproduces the byte arithmetic.
LLM_ORACLE_SQL["mm_resize_hash"] = f"""
SELECT doc_id, {_MEDIA_KIND} AS media_kind,
  8 AS width, 8 AS height,
  md5(substring(repeat(text, CAST(64 // length(text) AS INTEGER) + 1), 1, 64)) AS payload_md5
FROM documents ORDER BY doc_id
"""

# Frame sampling fake: payload = concatenation of 256-byte frames,
# keep every 2nd; last frame may be short (substring truncates the
# same way the Python slice does).
LLM_ORACLE_SQL["mm_frame_sample"] = f"""
WITH f AS (
  SELECT doc_id, text,
    unnest(range(0, CAST(greatest(length(text) // 256, 1) AS INTEGER), 2)) AS frame_idx
  FROM documents
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
  md5(substring(text, frame_idx * 256 + 1, 256)) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
"""

# One Lloyd iteration — assignment mirrors ann_cosine_ivf's CTEs; the
# per-component mean is an ordered double fold over members sorted by
# vec_id (list(... ORDER BY) + list_reduce), matching Spark's
# array_sort(collect_list) + aggregate fold bit-for-bit.
LLM_ORACLE_SQL["ann_kmeans_step"] = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='c.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='c.cvec', b='c.cvec'))} AS cosine
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
    FROM scored_assign
  ) t WHERE rn = 1
),
idx AS (
  SELECT centroid_id, vec_id, embedding,
    unnest(range(1, len(embedding) + 1)) AS i
  FROM assign
),
comp AS (
  SELECT centroid_id, CAST(i - 1 AS INTEGER) AS pos, vec_id,
    CAST(embedding[i] AS DOUBLE) AS v
  FROM idx
)
SELECT centroid_id, pos,
  list_reduce(list(v ORDER BY vec_id), (acc, x) -> acc + x)
    / CAST(COUNT(*) AS DOUBLE) AS mean_val,
  CAST(COUNT(*) AS BIGINT) AS n_members
FROM comp
GROUP BY centroid_id, pos
ORDER BY centroid_id, pos
"""

# Composed curation pipeline — canonical = min(doc_id) per identical
# text (mirrors exact_dedup_map's md5-group + min-id), gates in the
# same priority order, split from the shared md5 bucket.
LLM_ORACLE_SQL["corpus_curation"] = f"""
WITH base AS (
  SELECT doc_id,
    MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
    CAST(1 AS DOUBLE)
      - len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])))::DOUBLE
        / len(list_transform(range(1, len(string_split(text,' '))),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))::DOUBLE
      AS dup_2gram_fraction,
    CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
      + len(regexp_extract_all(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_IPV4}'))
      + len(regexp_extract_all(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_IPV4}', '<IP>', 'g'), '{_PII_SSN}'))
      + len(regexp_extract_all(regexp_replace(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_IPV4}', '<IP>', 'g'), '{_PII_SSN}', '<SSN>', 'g'), '{_PII_PHONE}'))
      AS INTEGER) AS n_pii,
    {_HASH_BUCKET.format(id='doc_id', buckets=1000)} AS bucket
  FROM documents
),
fated AS (
  SELECT *,
    CASE WHEN doc_id != canonical_id THEN 'duplicate'
         WHEN n_tokens < 30 THEN 'too_short'
         WHEN n_tokens > 90 THEN 'too_long'
         WHEN dup_2gram_fraction > 0.05 THEN 'repetitive'
         WHEN n_pii > 0 THEN 'has_pii'
    END AS reject_reason,
    CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split0
  FROM base
)
SELECT doc_id, n_tokens, dup_2gram_fraction, n_pii, reject_reason,
  CASE WHEN reject_reason IS NULL THEN split0 END AS split
FROM fated ORDER BY doc_id
"""

# Cross-doc contamination — document frequency over the same distinct
# 3-gram shingle relation the MinHash oracles build.
LLM_ORACLE_SQL["dedup_contamination"] = f"""
WITH {_SHINGLES},
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
SELECT s.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(COUNT(*) FILTER (WHERE d.df > 1) AS BIGINT) AS n_shared,
  CAST(COUNT(*) FILTER (WHERE d.df > 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contamination
FROM sh s JOIN dfreq d USING (shingle)
GROUP BY s.doc_id ORDER BY s.doc_id
"""

# Benchmark decontamination — docs < 50 are the benchmark vocabulary,
# the rest the corpus; overlap fraction per corpus doc.
LLM_ORACLE_SQL["dedup_decontaminate"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM d),
sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM idx
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
corpus AS (SELECT * FROM sh WHERE doc_id >= 50)
SELECT c.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(COUNT(b.shingle) AS BIGINT) AS n_overlap,
  CAST(COUNT(b.shingle) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS benchmark_overlap,
  CASE WHEN CAST(COUNT(b.shingle) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) > 0.2
       THEN 1 ELSE 0 END AS contaminated
FROM corpus c LEFT JOIN bench b USING (shingle)
GROUP BY c.doc_id ORDER BY c.doc_id
"""

# Sliding-window chunking — starts every (32-8)=24 tokens; the last
# chunk truncates exactly like Spark's slice().
LLM_ORACLE_SQL["text_chunking"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 24)) AS start
  FROM d
),
c AS (
  SELECT doc_id,
    CAST((start - 1) / 24 AS INTEGER) AS chunk_idx,
    array_to_string(list_slice(toks, start, start + 31), ' ') AS chunk_text
  FROM s
)
SELECT doc_id, chunk_idx,
  CAST(len(string_split(chunk_text, ' ')) AS INTEGER) AS n_chunk_tokens,
  md5(chunk_text) AS chunk_md5
FROM c ORDER BY doc_id, chunk_idx
"""

# Frequent-line (C4 boilerplate) removal at word granularity: tokens
# in >= ceil(0.78 * corpus) docs are boilerplate; text is reassembled
# from the surviving tokens in original order. COALESCE guards the
# no-boilerplate case (list() over zero rows is NULL).
LLM_ORACLE_SQL["corpus_line_dedup"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM d),
bp AS (
  SELECT tok FROM tok WHERE len(tok) > 0
  GROUP BY tok
  HAVING COUNT(*) >= CEIL(0.78 * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE))
),
bpl AS (SELECT COALESCE((SELECT list(tok) FROM bp), CAST([] AS VARCHAR[])) AS l)
SELECT doc_id,
  COALESCE(array_to_string(
    list_filter(toks, t -> len(t) > 0 AND NOT list_contains(bpl.l, t)), ' '
  ), '') AS text_clean,
  CAST(len(list_filter(toks, t -> len(t) > 0 AND NOT list_contains(bpl.l, t)))
       AS INTEGER) AS n_lines_kept,
  CAST(len(list_filter(toks, t -> list_contains(bpl.l, t))) AS INTEGER)
       AS n_lines_removed
FROM d, bpl ORDER BY doc_id
"""

# Per-source quota: same md5('cap' || id) ordering as corpusops._hash32.
LLM_ORACLE_SQL["sample_source_cap"] = """
SELECT doc_id, source FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source
    ORDER BY ('0x' || substring(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
             doc_id
  ) AS rn FROM documents
) t WHERE rn <= 80 ORDER BY doc_id
"""

# KMV distinct sketch: k smallest 32-bit md5 hashes per group;
# estimate (k-1)/frac via the same single double division as Spark.
LLM_ORACLE_SQL["sketch_kmv_distinct"] = """
WITH h AS (
  SELECT DISTINCT o_orderpriority AS grp,
    ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS hh
  FROM orders
),
r AS (SELECT grp, hh, row_number() OVER (PARTITION BY grp ORDER BY hh) AS rn FROM h),
k AS (
  SELECT grp, COUNT(*) AS n_kept, MAX(hh) AS kth_hash
  FROM r WHERE rn <= 64 GROUP BY grp
)
SELECT grp AS o_orderpriority, n_kept, n_kept < 64 AS "exact",
  CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
       ELSE CAST(63 AS DOUBLE) / (CAST(kth_hash AS DOUBLE) / CAST(4294967296 AS DOUBLE))
  END AS est_distinct
FROM k ORDER BY o_orderpriority
"""

# HyperLogLog registers, replayed exactly: top-8 hash bits pick the
# register, rho = 25 - bit_length(remaining 24 bits) (+w=0 case),
# per-register MAX, and the raw estimate with 2^-M as an exact
# integer shift — every float op dyadic, so the estimate hashes.
LLM_ORACLE_SQL["sketch_hll_distinct"] = """
WITH h AS (
  SELECT o_orderpriority AS grp,
    ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS hh
  FROM orders
),
rw AS (
  SELECT grp, hh // 16777216 AS reg, hh % 16777216 AS w FROM h
),
regs AS (
  SELECT grp, reg,
    MAX(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS m
  FROM rw GROUP BY grp, reg
),
agg AS (
  SELECT grp, COUNT(*) AS n_registers_hit,
    SUM(1.0 / CAST((CAST(1 AS BIGINT) << CAST(m AS INTEGER)) AS DOUBLE)) AS sum_inv -- lint: sum-ok (double summands, dyadic-exact)
  FROM regs GROUP BY grp
)
SELECT grp AS o_orderpriority,
  CAST(n_registers_hit AS BIGINT) AS n_registers_hit,
  sum_inv,
  CAST(0.7182725932495458 AS DOUBLE) * 65536.0
    / (sum_inv + CAST(256 - n_registers_hit AS DOUBLE)) AS est_distinct
FROM agg ORDER BY o_orderpriority
"""

# Deterministic training order: shard = hash('epoch0'||id) % 16,
# pos = rank of hash('epoch0|pos'||id) within the shard.
LLM_ORACLE_SQL["sample_training_order"] = """
WITH s AS (
  SELECT doc_id,
    ('0x' || substring(md5('epoch0' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16
      AS shard,
    ('0x' || substring(md5('epoch0|pos' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      AS ph
  FROM documents
)
SELECT doc_id, shard,
  CAST(row_number() OVER (PARTITION BY shard ORDER BY ph, doc_id) AS INTEGER) AS pos
FROM s ORDER BY doc_id
"""

# BPE pair statistics: word-frequency table → char symbols → adjacent
# pair counts weighted by freq. CASTs pin DuckDB's HUGEINT sum back to
# BIGINT; the (n DESC, sym_a, sym_b) order is total so LIMIT 20 is
# deterministic on both engines.
LLM_ORACLE_SQL["bpe_pair_step"] = """
WITH w AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) t WHERE len(word) > 0 GROUP BY word
),
s AS (SELECT freq, regexp_split_to_array(word, '') AS sy FROM w),
p AS (
  SELECT freq, sy[i] AS sym_a, sy[i + 1] AS sym_b
  FROM (SELECT freq, sy, unnest(range(1, len(sy))) AS i FROM s WHERE len(sy) >= 2) q
)
SELECT sym_a, sym_b, CAST(SUM(freq) AS BIGINT) AS n
FROM p GROUP BY sym_a, sym_b
ORDER BY n DESC, sym_a, sym_b LIMIT 20
"""

# Linear quality classifier: same feature fragments as
# text_quality_scores, then the EXACT left-associative weighted sum
# (bias, stopword, punct, mean_token_len, len_norm — order matters,
# float addition is not associative).
LLM_ORACLE_SQL["text_quality_classifier"] = f"""
WITH base AS (
  SELECT doc_id,
    CAST(length(text) AS INTEGER) AS n_chars,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
    CAST(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS INTEGER)
      AS n_punct,
    CAST(len(list_filter(string_split(text, ' '), t -> list_contains({_STOP_ALL}, t)))
      AS INTEGER) AS stop_hits
  FROM documents
),
feat AS (
  SELECT doc_id, n_tokens,
    CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
    CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
    CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
    CAST(least(n_tokens, 256) AS DOUBLE) / CAST(256 AS DOUBLE) AS len_norm
  FROM base
)
SELECT doc_id, n_tokens, stopword_ratio, punct_ratio, mean_token_len, len_norm,
  ((((CAST(-1.0 AS DOUBLE)
      + CAST(4.0 AS DOUBLE) * stopword_ratio)
      + CAST(-6.0 AS DOUBLE) * punct_ratio)
      + CAST(0.25 AS DOUBLE) * mean_token_len)
      + CAST(2.0 AS DOUBLE) * len_norm) AS quality_score,
  ((((CAST(-1.0 AS DOUBLE)
      + CAST(4.0 AS DOUBLE) * stopword_ratio)
      + CAST(-6.0 AS DOUBLE) * punct_ratio)
      + CAST(0.25 AS DOUBLE) * mean_token_len)
      + CAST(2.0 AS DOUBLE) * len_norm) >= CAST(0.0 AS DOUBLE) AS keep
FROM feat ORDER BY doc_id
"""

# Composed training-set assembly: classifier score (same chain as
# text_quality_classifier) → per-source cap 60 (keep-first hash
# order) → 90/5/5 hash split (salt 'epoch0') → (shard, pos) among
# selected rows. LEFT JOIN carries pos back to the fate table.
LLM_ORACLE_SQL["training_set_assembly"] = f"""
WITH feat AS (
  SELECT doc_id, source,
    CAST(len(list_filter(string_split(text, ' '), t -> list_contains({_STOP_ALL}, t)))
      AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
    CAST(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
      AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
    CAST(least(len(string_split(text, ' ')), 256) AS DOUBLE) / CAST(256 AS DOUBLE)
      AS len_norm
  FROM documents
),
scored AS (
  SELECT doc_id, source,
    ((((CAST(-1.0 AS DOUBLE)
        + CAST(4.0 AS DOUBLE) * stopword_ratio)
        + CAST(-6.0 AS DOUBLE) * punct_ratio)
        + CAST(0.25 AS DOUBLE) * mean_token_len)
        + CAST(2.0 AS DOUBLE) * len_norm) AS quality_score
  FROM feat
),
base AS (
  SELECT doc_id, source, quality_score,
    quality_score >= CAST(0.0 AS DOUBLE) AS keep,
    row_number() OVER (
      PARTITION BY source
      ORDER BY (quality_score >= CAST(0.0 AS DOUBLE)) DESC,
        ('0x' || substring(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
        doc_id
    ) AS rn,
    ('0x' || substring(md5('epoch0' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
      AS bucket,
    ('0x' || substring(md5('epoch0|shard' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
      AS shard_raw
  FROM scored
),
lab AS (
  SELECT *, keep AND rn <= 60 AS selected,
    CASE WHEN bucket < 900 THEN 'train'
         WHEN bucket < 950 THEN 'val'
         ELSE 'test' END AS split_label
  FROM base
),
sel AS (
  SELECT doc_id,
    CAST(row_number() OVER (
      PARTITION BY split_label, shard_raw
      ORDER BY ('0x' || substring(md5('epoch0|pos' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
               doc_id
    ) AS INTEGER) AS pos
  FROM lab WHERE selected
)
SELECT b.doc_id, b.source, b.quality_score,
  CASE WHEN NOT b.keep THEN 'filtered_quality'
       WHEN NOT b.selected THEN 'capped'
       ELSE b.split_label END AS fate,
  CASE WHEN b.selected THEN b.split_label END AS split,
  CASE WHEN b.selected THEN b.shard_raw END AS shard,
  s.pos
FROM lab b LEFT JOIN sel s USING (doc_id) ORDER BY b.doc_id
"""

# Sampled quantiles: identical k-smallest-hash sample per group, then
# percentile_cont (the a + f*(b-a) rule Spark's `percentile` shares).
LLM_ORACLE_SQL["sketch_sampled_quantiles"] = """
WITH r AS (
  SELECT o_orderpriority AS grp, o_totalprice AS v,
    row_number() OVER (
      PARTITION BY o_orderpriority
      ORDER BY ('0x' || substring(md5('q' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT,
               o_orderkey
    ) AS rn
  FROM orders
)
SELECT grp AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_sampled,
  percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS p50,
  percentile_cont(0.9) WITHIN GROUP (ORDER BY v) AS p90,
  percentile_cont(0.99) WITHIN GROUP (ORDER BY v) AS p99
FROM r WHERE rn <= 128 GROUP BY grp ORDER BY grp
"""

# Sqrt-temperature mixture weights: sqrt is IEEE-correctly-rounded in
# both engines; the normalizing total is the same ordered group fold
# (list ORDER BY grp + list_reduce ≡ aggregate over array_sort).
_MIXTURE_QUOTAS = """
mc AS (
  SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
mw AS (SELECT grp, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w_raw FROM mc),
mt AS (
  SELECT list_reduce(list(w_raw ORDER BY grp), (acc, x) -> acc + x) AS w_total
  FROM mw
),
mq AS (
  SELECT grp, n_docs, w_raw, w_raw / w_total AS weight,
    least(n_docs,
          CAST(floor(200.0 * (w_raw / w_total)) AS BIGINT)) AS planned_docs
  FROM mw, mt
)
"""

LLM_ORACLE_SQL["sample_mixture_weights"] = f"""
WITH {_MIXTURE_QUOTAS.strip()}
SELECT grp AS source, n_docs, w_raw, weight, planned_docs
FROM mq ORDER BY source
"""

# Temperature sampling: quotas joined back, same md5('mix'||id) rank
# order as sampling.temperature_sample.
LLM_ORACLE_SQL["sample_temperature_mixture"] = f"""
WITH {_MIXTURE_QUOTAS.strip()},
r AS (
  SELECT d.doc_id, d.source, q.planned_docs,
    row_number() OVER (
      PARTITION BY d.source
      ORDER BY ('0x' || substring(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT,
               d.doc_id
    ) AS rn
  FROM documents d JOIN mq q ON d.source = q.grp
)
SELECT doc_id, source, rn <= planned_docs AS selected
FROM r ORDER BY doc_id
"""

# Int8 scalar quantization: floor((x-mn)/scale + 0.5) codes, BIGINT
# fold sums — min/max are exact, floor is exact, integer sums are
# order-independent, so every column hash-matches.
_QUANTIZED = """
qb AS (
  SELECT vec_id, embedding,
    CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS q_mn,
    CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS q_mx
  FROM embeddings
),
qs AS (
  SELECT vec_id, q_mn, q_mx,
    CASE WHEN q_mx > q_mn THEN (q_mx - q_mn) / 255.0 ELSE 0.0 END AS q_scale,
    CASE WHEN q_mx > q_mn THEN
      list_transform(embedding, x ->
        CAST(floor((CAST(x AS DOUBLE) - q_mn) / ((q_mx - q_mn) / 255.0) + 0.5)
             AS BIGINT))
    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS qv
  FROM qb
),
qf AS (
  SELECT vec_id, q_mn, q_mx, q_scale, qv,
    list_reduce(qv, (acc, x) -> acc + x) AS q_sum,
    list_reduce(list_transform(qv, x -> x * x), (acc, x) -> acc + x) AS q_norm2,
    CAST(len(qv) AS DOUBLE) AS dim
  FROM qs
)
"""

LLM_ORACLE_SQL["emb_quantize_int8"] = f"""
WITH {_QUANTIZED.strip()}
SELECT vec_id, q_mn, q_mx, q_scale, q_sum, q_norm2
FROM qf ORDER BY vec_id
"""

# Quantized brute-force top-k: dequantized dot from integer sums —
# term order matches quantize._dequant_dot / _dequant_norm2 exactly
# (left-associative products and sums).
_QDOT_SQL = (
    "list_reduce(list_transform(range(1, len(q.qv) + 1),"
    " i -> q.qv[i] * c.qv[i]), (acc, v) -> acc + v)"
)

LLM_ORACLE_SQL["ann_cosine_int8"] = f"""
WITH {_QUANTIZED.strip()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    q.q_scale * c.q_scale * CAST({_QDOT_SQL} AS DOUBLE)
      + q.q_scale * c.q_mn * CAST(q.q_sum AS DOUBLE)
      + c.q_scale * q.q_mn * CAST(c.q_sum AS DOUBLE)
      + q.dim * q.q_mn * c.q_mn AS dot,
    q.q_scale * q.q_scale * CAST(q.q_norm2 AS DOUBLE)
      + 2.0 * q.q_scale * q.q_mn * CAST(q.q_sum AS DOUBLE)
      + q.dim * q.q_mn * q.q_mn AS qn,
    c.q_scale * c.q_scale * CAST(c.q_norm2 AS DOUBLE)
      + 2.0 * c.q_scale * c.q_mn * CAST(c.q_sum AS DOUBLE)
      + q.dim * c.q_mn * c.q_mn AS cn
  FROM qf c, qf q
  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot / (sqrt(qn) * sqrt(cn)) AS cosine,
    row_number() OVER (
      PARTITION BY query_id
      ORDER BY dot / (sqrt(qn) * sqrt(cn)) DESC, neighbor_id ASC
    ) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

# Char-bigram LM score: integer document-frequency sums, one final
# division — the model join is vocabulary-sized in both engines.
LLM_ORACLE_SQL["text_charlm_score"] = """
WITH big AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS bg
  FROM (
    SELECT doc_id, text, unnest(range(1, length(text))) AS i
    FROM documents WHERE length(text) >= 2
  ) t
),
m AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM big GROUP BY bg)
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
  CAST(SUM(m.cnt) AS BIGINT) AS hit_sum,
  CAST(SUM(m.cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_df
FROM big b JOIN m USING (bg)
GROUP BY b.doc_id ORDER BY doc_id
"""

# Synthesized URLs — mirrors llm_queries._with_synth_urls exactly.
_SYNTH_URL = """
su AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
    || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
             WHEN doc_id % 5 = 1 THEN 'cdn' || CAST(doc_id % 7 AS VARCHAR) || '.Example.com:8080'
             WHEN doc_id % 5 = 2 THEN 'sub.site' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
             WHEN doc_id % 5 = 3 THEN 'localhost'
             ELSE 'site' || CAST(doc_id % 7 AS VARCHAR) || '.org' END)
    || (CASE WHEN doc_id % 3 = 0 THEN ''
             WHEN doc_id % 3 = 1 THEN '/a/b/' || CAST(doc_id % 11 AS VARCHAR)
             ELSE '/page' END)
    || (CASE WHEN doc_id % 4 = 0 THEN '?b=2&a=1#frag'
             WHEN doc_id % 4 = 1 THEN '#top'
             WHEN doc_id % 4 = 2 THEN '?z=9&m=5&c=3'
             ELSE '' END) AS url
  FROM documents
)
"""

from etl_reporting_spark.llm.urls import TWO_LEVEL_SUFFIXES as _PSL2  # noqa: E402

_PSL2_SQL = "[" + ", ".join(f"'{s}'" for s in _PSL2) + "]"

_URL_PARTS = f"""
up AS (
  SELECT doc_id, url,
    CASE WHEN instr(url, '://') > 0 THEN split_part(url, '://', 1) ELSE '' END AS scheme,
    CASE WHEN instr(url, '://') > 0 THEN split_part(url, '://', 2) ELSE url END AS rest
  FROM su
),
uh AS (
  SELECT doc_id, url, scheme, rest,
    lower(split_part(split_part(split_part(split_part(rest, '/', 1), '?', 1), '#', 1), ':', 1)) AS host,
    CASE WHEN instr(rest, '/') > 0 THEN substring(rest, instr(rest, '/')) ELSE '/' END AS path_full,
    CASE WHEN instr(url, '?') > 0 THEN split_part(split_part(url, '?', 2), '#', 1) ELSE '' END AS query
  FROM up
),
ud AS (
  SELECT doc_id, url, scheme, host,
    string_split(host, '.') AS labels,
    split_part(split_part(path_full, '?', 1), '#', 1) AS path,
    CASE WHEN query <> '' THEN array_to_string(list_sort(string_split(query, '&')), '&')
         ELSE '' END AS query_sorted
  FROM uh
),
ur AS (
  SELECT doc_id, url, scheme, host, path, query_sorted,
    len(labels) AS n,
    concat_ws('.', labels[-2], labels[-1]) AS last2,
    concat_ws('.', labels[-3], labels[-2], labels[-1]) AS last3
  FROM ud
),
uparts AS (
  SELECT doc_id, url, scheme, host,
    CASE WHEN n >= 3 AND list_contains({_PSL2_SQL}, last2) THEN last3
         WHEN n >= 2 THEN last2 ELSE host END AS registrable_domain,
    path, query_sorted
  FROM ur
)
"""

LLM_ORACLE_SQL["url_parse_domains"] = f"""
WITH {_SYNTH_URL.strip()},
{_URL_PARTS.strip()}
SELECT doc_id, url, scheme, host, registrable_domain, path, query_sorted
FROM uparts ORDER BY doc_id
"""

LLM_ORACLE_SQL["url_domain_stats"] = f"""
WITH {_SYNTH_URL.strip()},
{_URL_PARTS.strip()}
SELECT registrable_domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM su) AS DOUBLE) AS corpus_share
FROM uparts GROUP BY registrable_domain ORDER BY registrable_domain
"""

# Span-level exact-substring dedup: identical window/stride/md5
# construction (stride 1: every alignment, guaranteed detection);
# Spark sequence(1, n-w+1, s) ≡ DuckDB range(1, n-w+2, s).
LLM_ORACLE_SQL["dedup_span_stats"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 8
),
sp AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks) - 8 + 2, 1)) AS i
    FROM t
  ) x
),
f AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS span_df FROM sp GROUP BY h)
SELECT sp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
  CAST(COUNT(CASE WHEN f.span_df >= 2 THEN 1 END) AS BIGINT) AS n_dup_spans,
  CAST(COUNT(CASE WHEN f.span_df >= 2 THEN 1 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
FROM sp JOIN f USING (h)
GROUP BY sp.doc_id ORDER BY sp.doc_id
"""

# SemDeDup: id-seed centroid assignment (same CTEs as ann_cosine_ivf),
# then within-cluster pairwise cosine and the min-id keep rule — a
# vector is a semantic dup iff an earlier-id cluster-mate scores
# cosine >= 0.4 against it.
LLM_ORACLE_SQL["semdedup_flags"] = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='c.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='c.cvec', b='c.cvec'))} AS cosine
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
    FROM scored_assign
  ) t WHERE rn = 1
),
dups AS (
  SELECT DISTINCT b.vec_id AS dup_id
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {_COS.format(dot=_DOT9.format(a='a.embedding', b='b.embedding'),
                     na=_DOT9.format(a='a.embedding', b='a.embedding'),
                     nb=_DOT9.format(a='b.embedding', b='b.embedding'))} >= 0.4
)
SELECT assign.vec_id, assign.centroid_id,
  CAST(CASE WHEN dups.dup_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
    AS is_semantic_dup
FROM assign LEFT JOIN dups ON assign.vec_id = dups.dup_id
ORDER BY assign.vec_id
"""

# Domain blocklist: identical suffix-explode equi-join — host label
# suffixes (full host → TLD) joined against the inline blocklist,
# first (most specific) match wins; left join back for the 0/1 label.
LLM_ORACLE_SQL["url_blocklist"] = f"""
WITH {_SYNTH_URL.strip()},
{_URL_PARTS.strip()},
bl AS (
  SELECT lower(domain) AS suffix FROM (VALUES
    ('example.com'), ('site3.co.uk'), ('site0.org'), ('localhost')
  ) t(domain)
),
sufs AS (
  SELECT doc_id, i - 1 AS depth,
    array_to_string(
      list_slice(string_split(host, '.'), i, len(string_split(host, '.'))), '.'
    ) AS suffix
  FROM (
    SELECT doc_id, host, unnest(range(1, len(string_split(host, '.')) + 1)) AS i
    FROM uparts
  ) x
),
hits AS (
  SELECT doc_id, arg_min(sufs.suffix, depth) AS blocked_by
  FROM sufs JOIN bl ON sufs.suffix = bl.suffix
  GROUP BY doc_id
)
SELECT u.doc_id, u.host,
  CAST(CASE WHEN h.blocked_by IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS blocked,
  h.blocked_by
FROM uparts u LEFT JOIN hits h USING (doc_id)
ORDER BY u.doc_id
"""


# Count-min sketch: same per-row salted _hash32 buckets (md5 prefix →
# 32-bit int → % width), same min-over-rows estimate; the exact join
# makes the overestimate property part of the checked contract.
LLM_ORACLE_SQL["sketch_countmin"] = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
ds AS (SELECT unnest(range(0, 4)) AS d),
sk AS (
  SELECT d AS sketch_row,
    ({_hex_to_int_sql("md5('cm' || CAST(d AS VARCHAR) || term)", 1, 8)}) % 512 AS bucket,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok, ds GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id < 3
),
pb AS (
  SELECT term, d AS sketch_row,
    ({_hex_to_int_sql("md5('cm' || CAST(d AS VARCHAR) || term)", 1, 8)}) % 512 AS bucket
  FROM probes, ds
),
est AS (
  SELECT term, MIN(COALESCE(cnt, 0)) AS cm_estimate
  FROM pb LEFT JOIN sk USING (sketch_row, bucket) GROUP BY term
),
exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count FROM tok GROUP BY term
)
SELECT est.term, est.cm_estimate, exact.exact_count
FROM est JOIN exact USING (term) ORDER BY term
"""


# Bloom screen: identical salted-position construction (md5 prefix →
# 32-bit int % m), pos>>5 / pos&31 word packing, bit_or build, all-k
# conjunction probe over the corpus shingle set; exact membership
# joined in so bloom ≥ exact is checked, not assumed.
LLM_ORACLE_SQL["sketch_bloom_screen"] = f"""
WITH {_SHINGLES.strip()},
corpus AS (SELECT DISTINCT shingle FROM sh WHERE doc_id >= 50),
batch AS (SELECT doc_id, shingle FROM sh WHERE doc_id < 50),
ks AS (SELECT unnest(range(0, 5)) AS i),
cpos AS (
  SELECT ({_hex_to_int_sql("md5('bf' || CAST(i AS VARCHAR) || shingle)", 1, 8)}) % 262144 AS pos
  FROM corpus, ks
),
bloom AS (
  SELECT pos >> 5 AS word_idx, bit_or(CAST(1 AS BIGINT) << (pos & 31)) AS word
  FROM cpos GROUP BY 1
),
probes AS (SELECT DISTINCT shingle FROM batch),
bpos AS (
  SELECT shingle,
    ({_hex_to_int_sql("md5('bf' || CAST(i AS VARCHAR) || shingle)", 1, 8)}) % 262144 AS pos
  FROM probes, ks
),
member AS (
  SELECT b.shingle,
    MIN(CASE WHEN COALESCE(bl.word, 0) & (CAST(1 AS BIGINT) << (b.pos & 31))
             = (CAST(1 AS BIGINT) << (b.pos & 31)) THEN 1 ELSE 0 END) AS bloom_member
  FROM bpos b LEFT JOIN bloom bl ON (b.pos >> 5) = bl.word_idx
  GROUP BY b.shingle
)
SELECT batch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(SUM(member.bloom_member) AS BIGINT) AS n_maybe_seen,
  CAST(SUM(CASE WHEN corpus.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
FROM batch
JOIN member USING (shingle)
LEFT JOIN corpus ON batch.shingle = corpus.shingle
GROUP BY batch.doc_id
ORDER BY batch.doc_id
"""

# Perceptual hash: byte histogram mod 64 (ASCII corpus: chars ≡
# bytes), bit i set iff count·64 > total (integer compare), bit 63
# added as -2^63 so the packed value is the same signed BIGINT the
# Pandas UDF emits.
LLM_ORACLE_SQL["mm_phash"] = """
WITH ch AS (
  SELECT doc_id, ascii(unnest(string_split(text, ''))) % 64 AS h FROM documents
),
hist AS (SELECT doc_id, h, COUNT(*) AS c FROM ch GROUP BY doc_id, h),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM hist GROUP BY doc_id),
bits AS (
  SELECT hist.doc_id,
    CAST(SUM(CASE WHEN c * 64 > t THEN
      CASE WHEN h = 63 THEN -9223372036854775808 ELSE CAST(1 AS BIGINT) << h END
    ELSE 0 END) AS BIGINT) AS phash
  FROM hist JOIN tot USING (doc_id) GROUP BY hist.doc_id
)
SELECT doc_id, phash FROM bits ORDER BY doc_id
"""

# PQ/ADC: seed codebook slices, per-subspace L2 argmin encode, query
# LUT, ordered per-subspace folds for the ADC dot and approx norm —
# every double op fixed-shape or ordered, so the doubly-approximate
# score still hash-matches.
_PQ_DOT = (
    "list_reduce(list_transform(range(1, 9),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, v) -> acc + v)"
)
_PQ_L2 = (
    "list_reduce(list_transform(range(1, 9),"
    " i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), (acc, v) -> acc + v)"
)

LLM_ORACLE_SQL["ann_cosine_pq"] = f"""
WITH subs AS (SELECT unnest(range(0, 8)) AS subspace),
cb AS (
  SELECT s.subspace, e.vec_id AS code,
    list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS subvec
  FROM embeddings e, subs s WHERE e.vec_id < 16
),
cbn AS (
  SELECT subspace, code, subvec,
    {_PQ_DOT.format(a='subvec', b='subvec')} AS cn2
  FROM cb
),
ex AS (
  SELECT e.vec_id, s.subspace,
    list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
  FROM embeddings e, subs s
),
enc AS (
  SELECT vec_id, subspace, code FROM (
    SELECT ex.vec_id, ex.subspace, cbn.code,
      ROW_NUMBER() OVER (
        PARTITION BY ex.vec_id, ex.subspace
        ORDER BY {_PQ_L2.format(a='ex.xsub', b='cbn.subvec')} ASC, cbn.code ASC
      ) AS rn
    FROM ex JOIN cbn ON ex.subspace = cbn.subspace
  ) t WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec,
    {_DOT9.format(a='embedding', b='embedding')} AS qn2
  FROM embeddings WHERE vec_id < 5
),
lut AS (
  SELECT q.query_id, q.qn2, cbn.subspace, cbn.code, cbn.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cbn.subspace * 8 + 1, cbn.subspace * 8 + 8)", b='cbn.subvec')} AS pdot
  FROM q, cbn
),
parts AS (
  SELECT lut.query_id, enc.vec_id, ANY_VALUE(lut.qn2) AS qn2,
    list_reduce(list(lut.pdot ORDER BY lut.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(lut.cn2 ORDER BY lut.subspace), (acc, v) -> acc + v) AS approx_cn2
  FROM enc JOIN lut ON enc.subspace = lut.subspace AND enc.code = lut.code
  WHERE enc.vec_id != lut.query_id
  GROUP BY lut.query_id, enc.vec_id
)
SELECT query_id, rank, neighbor_id, adc_score FROM (
  SELECT query_id, vec_id AS neighbor_id,
    adc_dot / (sqrt(qn2) * sqrt(approx_cn2)) AS adc_score,
    ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY adc_dot / (sqrt(qn2) * sqrt(approx_cn2)) DESC, vec_id ASC
    ) AS rank
  FROM parts
) t WHERE rank <= 5
ORDER BY query_id, rank
"""

# IVF+PQ composition: the ann_cosine_ivf assignment CTEs gate the
# pair space to same-cell, then the ann_cosine_pq CTEs score it.
LLM_ORACLE_SQL["ann_cosine_ivfpq"] = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='c.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='c.cvec', b='c.cvec'))} AS cosine
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
    FROM scored_assign
  ) t WHERE rn = 1
),
subs AS (SELECT unnest(range(0, 8)) AS subspace),
cbn AS (
  SELECT s.subspace, e.vec_id AS code,
    list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS subvec,
    {_PQ_DOT.format(a="list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8)",
                    b="list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8)")} AS cn2
  FROM embeddings e, subs s WHERE e.vec_id < 16
),
ex AS (
  SELECT e.vec_id, s.subspace,
    list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
  FROM embeddings e, subs s
),
enc AS (
  SELECT vec_id, subspace, code FROM (
    SELECT ex.vec_id, ex.subspace, cbn.code,
      ROW_NUMBER() OVER (
        PARTITION BY ex.vec_id, ex.subspace
        ORDER BY {_PQ_L2.format(a='ex.xsub', b='cbn.subvec')} ASC, cbn.code ASC
      ) AS rn
    FROM ex JOIN cbn ON ex.subspace = cbn.subspace
  ) t WHERE rn = 1
),
q AS (
  SELECT e.vec_id AS query_id, e.embedding AS qvec,
    {_DOT9.format(a='e.embedding', b='e.embedding')} AS qn2,
    a.centroid_id AS qcell
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
  WHERE e.vec_id < 5
),
lut AS (
  SELECT q.query_id, q.qn2, q.qcell, cbn.subspace, cbn.code, cbn.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cbn.subspace * 8 + 1, cbn.subspace * 8 + 8)", b='cbn.subvec')} AS pdot
  FROM q, cbn
),
parts AS (
  SELECT lut.query_id, enc.vec_id, ANY_VALUE(lut.qn2) AS qn2,
    list_reduce(list(lut.pdot ORDER BY lut.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(lut.cn2 ORDER BY lut.subspace), (acc, v) -> acc + v) AS approx_cn2
  FROM enc
  JOIN assign ca ON enc.vec_id = ca.vec_id
  JOIN lut ON enc.subspace = lut.subspace AND enc.code = lut.code
          AND ca.centroid_id = lut.qcell
  WHERE enc.vec_id != lut.query_id
  GROUP BY lut.query_id, enc.vec_id
)
SELECT query_id, rank, neighbor_id, adc_score FROM (
  SELECT query_id, vec_id AS neighbor_id,
    adc_dot / (sqrt(qn2) * sqrt(approx_cn2)) AS adc_score,
    ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY adc_dot / (sqrt(qn2) * sqrt(approx_cn2)) DESC, vec_id ASC
    ) AS rank
  FROM parts
) t WHERE rank <= 5
ORDER BY query_id, rank
"""

# Hard negatives: exact top-(k+8) per query minus the labeled
# positives, re-ranked; same fold/tie-break conventions as
# ann_cosine_topk.
LLM_ORACLE_SQL["emb_hard_negatives"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {_COS.format(dot=_DOT9.format(a='q.qvec', b='c.embedding'),
                 na=_DOT9.format(a='q.qvec', b='q.qvec'),
                 nb=_DOT9.format(a='c.embedding', b='c.embedding'))} AS cosine
  FROM q JOIN embeddings c ON c.vec_id != q.query_id
),
cands AS (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
  ) t WHERE rank <= 13
),
pos AS (
  SELECT query_id, query_id + 100 AS pos_id FROM q
  UNION ALL
  SELECT query_id, query_id + 200 AS pos_id FROM q
),
neg AS (
  SELECT c.* FROM cands c
  LEFT JOIN pos p ON c.query_id = p.query_id AND c.neighbor_id = p.pos_id
  WHERE p.query_id IS NULL
)
SELECT query_id, neg_rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS neg_rank
  FROM neg
) t WHERE neg_rank <= 5
ORDER BY query_id, neg_rank
"""

# Language mixture: language-ID CTE feeding the temperature-weight
# math (n^0.25 via sqrt(sqrt) — IEEE-exact; ordered group fold for
# the normalizing total, as the mixture gates).
LLM_ORACLE_SQL["corpus_language_mixture"] = f"""
WITH scores AS (
  SELECT doc_id,
{_LANG_SCORES}
  FROM documents
),
lang AS (
  SELECT doc_id, {_LANG_PRED} AS predicted_lang FROM scores
),
mc AS (
  SELECT predicted_lang AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM lang GROUP BY predicted_lang
),
mw AS (SELECT grp, n_docs, sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS w_raw FROM mc),
mt AS (
  SELECT list_reduce(list(w_raw ORDER BY grp), (acc, x) -> acc + x) AS w_total
  FROM mw
),
mq AS (
  SELECT grp, n_docs, w_raw, w_raw / w_total AS weight,
    least(n_docs,
          CAST(floor(300.0 * (w_raw / w_total)) AS BIGINT)) AS planned_docs
  FROM mw, mt
)
SELECT grp AS predicted_lang, n_docs, w_raw, weight, planned_docs
FROM mq ORDER BY predicted_lang
"""

# HTML extraction: identical Java∩RE2 patterns; DuckDB regexp_replace
# needs the explicit 'g' flag (Spark replaces all matches by default)
# and chr(10) in replacements (escape sequences stay literal in SQL
# strings).
_SYNTH_HTML = """
hsrc AS (
  SELECT doc_id,
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
    || ' &amp; friends</title><script>var x=1;</script>'
    || '<style>.a{color:red}</style></head><body>'
    || '<div id="nav">home | <a href="https://site' || CAST(doc_id % 7 AS VARCHAR)
    || '.org/a">one</a></div><p>'
    || substring(text, 1, 60)
    || '</p><P>'
    || substring(text, 61)
    || '</P><a href="/rel/' || CAST(doc_id % 11 AS VARCHAR)
    || '">rel</a><a href=' || chr(39) || '/sq/' || CAST(doc_id % 5 AS VARCHAR)
    || chr(39) || '>s</a>&nbsp;&lt;end&gt;</body></html>' AS html
  FROM documents
)
"""

LLM_ORACLE_SQL["web_text_extraction"] = f"""
WITH {_SYNTH_HTML.strip()},
stripped AS (
  SELECT doc_id, html,
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(html,
                    '(?is)<(script|style|head)[^>]*>.*?</(script|style|head)>', ' ', 'g'),
                  '(?i)</(p|div|li|h[1-6]|tr|table|ul|ol)>|<br[^>]*>', chr(10), 'g'),
                '<[^>]+>', ' ', 'g'),
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
          '[ \t]+', ' ', 'g'),
        ' ?' || chr(10) || ' ?', chr(10), 'g'),
        chr(10) || '{{2,}}', chr(10), 'g'),
      '^' || chr(10) || '+|' || chr(10) || '+$', '', 'g')
    ) AS text_clean
  FROM hsrc
),
titled AS (
  SELECT doc_id, html, text_clean,
    trim(replace(replace(replace(replace(replace(replace(
      regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&')) AS title,
    list_transform(
      regexp_extract_all(html,
        '(?i)<a[^>]*href=("[^"]*"|' || chr(39) || '[^' || chr(39) || ']*' || chr(39)
        || '|[^"' || chr(39) || E'\\s>]+)', 1),
      x -> CASE WHEN substring(x, 1, 1) IN ('"', chr(39))
                THEN substring(x, 2, length(x) - 2) ELSE x END
    ) AS links
  FROM stripped
)
SELECT doc_id, title, text_clean,
  CAST(len(links) AS INTEGER) AS n_links,
  links[1] AS link_1, links[2] AS link_2, links[3] AS link_3
FROM titled ORDER BY doc_id
"""


# Leakage-safe split: the full cluster-resolution oracle as a
# subquery, split boundaries on md5(cluster_id) buckets — identical
# 800/900 cut points as with_hash_split({train:.8, val:.1, test:.1}).
LLM_ORACLE_SQL["sample_leakage_safe_split"] = f"""
WITH clusters AS (
{LLM_ORACLE_SQL["dedup_cluster_resolution"].strip()}
)
SELECT doc_id, cluster_id, cluster_size,
  CASE WHEN b < 800 THEN 'train'
       WHEN b < 900 THEN 'val'
       ELSE 'test' END AS split
FROM (
  SELECT *, {_HASH_BUCKET.format(id="cluster_id", buckets=1000)} AS b FROM clusters
) t
ORDER BY doc_id
"""

# Normalization dedup: same lower/translate/strip/collapse chain
# (DuckDB regexp_replace with 'g'); group sizes per raw and
# normalized hash joined back per doc.
LLM_ORACLE_SQL["text_normalize_dedup"] = """
WITH n AS (
  SELECT doc_id, md5(text) AS raw_hash,
    md5(trim(regexp_replace(regexp_replace(
      lower(regexp_replace(text, '[^\\x20-\\x7e]', ' ', 'g')),
      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS norm_hash
  FROM documents
),
r AS (SELECT raw_hash, CAST(COUNT(*) AS BIGINT) AS raw_group_size FROM n GROUP BY 1),
m AS (SELECT norm_hash, CAST(COUNT(*) AS BIGINT) AS norm_group_size FROM n GROUP BY 1)
SELECT n.doc_id, n.norm_hash, r.raw_group_size, m.norm_group_size
FROM n JOIN r USING (raw_hash) JOIN m USING (norm_hash)
ORDER BY n.doc_id
"""

# Corpus DQ battery: same fused checks, same verdict shape.
LLM_ORACLE_SQL["dq_corpus_battery"] = """
WITH base AS (
  SELECT
    CAST(COUNT(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 END) AS BIGINT) AS c1,
    CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS c2,
    CAST(COUNT(CASE WHEN text IS NOT NULL AND len(string_split(text, ' ')) < 5 THEN 1 END) AS BIGINT) AS c3
  FROM documents
),
dup AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT) AS c4  -- lint: sum-ok (BIGINT cast)
  FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1) g
),
stacked AS (
  SELECT 'CORPUS-001' AS test_id, c1 AS failed_rows FROM base
  UNION ALL SELECT 'CORPUS-002', c2 FROM base
  UNION ALL SELECT 'CORPUS-003', c3 FROM base
  UNION ALL SELECT 'CORPUS-004', c4 FROM dup
)
SELECT test_id,
  CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
  failed_rows
FROM stacked ORDER BY test_id
"""

# Multi-probe IVF: identical to ann_cosine_ivf except the probe side
# keeps rn <= 2 cells per query.
LLM_ORACLE_SQL["ann_cosine_ivf_probe2"] = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='c.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='c.cvec', b='c.cvec'))} AS cosine
  FROM embeddings e, cent c
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM scored_assign
),
assign AS (SELECT vec_id, embedding, centroid_id FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id, embedding, centroid_id FROM ranked WHERE rn <= 2 AND vec_id < 5
),
scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
    {_COS.format(dot=_DOT9.format(a='q.embedding', b='a.embedding'),
                 na=_DOT9.format(a='q.embedding', b='q.embedding'),
                 nb=_DOT9.format(a='a.embedding', b='a.embedding'))} AS cosine
  FROM probes q JOIN assign a
    ON q.centroid_id = a.centroid_id AND a.vec_id != q.vec_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= 5
ORDER BY query_id, rank
"""

# REAL-codec decode (round-5): the Spark side encodes actual
# PNG/BMP/PPM bytes and decodes them with the pure-stdlib codecs; the
# oracle needs no codec because the pixels follow
# (doc_id*7 + p*13) % 256 analytically. A decoder defect (PNG filter
# math, BMP BGR/row-padding, PPM header) breaks pixel_sum.
LLM_ORACLE_SQL["mm_decode_real"] = """
WITH px AS (
  SELECT d.doc_id,
         CAST(SUM((d.doc_id * 7 + p.p * 13) % 256) AS BIGINT) AS pixel_sum
  FROM documents d, generate_series(0, 767) AS p(p)
  GROUP BY d.doc_id
)
SELECT doc_id,
       CASE doc_id % 4 WHEN 2 THEN 'bmp' WHEN 3 THEN 'ppm' ELSE 'png' END AS fmt,
       16 AS width, 16 AS height, 3 AS channels, pixel_sum
FROM px
ORDER BY doc_id
"""

# 96x96 variant of the decode gate (throughput instrument): same
# analytic pixel formula, 27648 pixel bytes per image.
LLM_ORACLE_SQL["mm_decode_throughput"] = """
WITH px AS (
  SELECT d.doc_id,
         CAST(SUM((d.doc_id * 7 + p.p * 13) % 256) AS BIGINT) AS pixel_sum
  FROM documents d, generate_series(0, 27647) AS p(p)
  GROUP BY d.doc_id
)
SELECT doc_id,
       CASE doc_id % 4 WHEN 2 THEN 'bmp' WHEN 3 THEN 'ppm' ELSE 'png' END AS fmt,
       96 AS width, 96 AS height, 3 AS channels, pixel_sum
FROM px
ORDER BY doc_id
"""

# Average-hash over the real decoded pixels, replayed in SQL: cell i
# of the 8x8 thumbnail reads source pixel (2*(i//8), 2*(i%8)) (16x16
# -> 8x8 nearest), gray = (r+g+b)//3, bit set iff gray*64 > total,
# bit 63 packed as -2^63 (two's complement, same signed BIGINT the
# Pandas UDF emits).
LLM_ORACLE_SQL["mm_ahash_real"] = """
WITH cell AS (
  SELECT d.doc_id, t.i,
    (
      (d.doc_id * 7 + (((t.i // 8) * 2 * 16 + (t.i % 8) * 2) * 3 + 0) * 13) % 256
    + (d.doc_id * 7 + (((t.i // 8) * 2 * 16 + (t.i % 8) * 2) * 3 + 1) * 13) % 256
    + (d.doc_id * 7 + (((t.i // 8) * 2 * 16 + (t.i % 8) * 2) * 3 + 2) * 13) % 256
    ) // 3 AS gray
  FROM documents d, generate_series(0, 63) AS t(i)
),
tot AS (SELECT doc_id, CAST(SUM(gray) AS BIGINT) AS total FROM cell GROUP BY doc_id)
SELECT cell.doc_id,
  CAST(SUM(CASE WHEN gray * 64 > total THEN
    CASE WHEN i = 63 THEN -9223372036854775808 ELSE CAST(1 AS BIGINT) << i END
  ELSE 0 END) AS BIGINT) AS ahash
FROM cell JOIN tot USING (doc_id)
GROUP BY cell.doc_id
ORDER BY cell.doc_id
"""


# Recall@5 of IVF vs exact brute force, per query, probes 1 and 2 —
# the recall-lever evidence. Both pipelines are replayed exactly; a
# join-semantics bug moves a recall number and breaks the hash.
LLM_ORACLE_SQL["ann_recall_ivf"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 20
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
exact_scored AS (
  SELECT query_id, neighbor_id,
    CAST({_DOT9.format(a='qvec', b='cvec')} AS DOUBLE)
      / (sqrt(CAST({_DOT9.format(a='qvec', b='qvec')} AS DOUBLE))
         * sqrt(CAST({_DOT9.format(a='cvec', b='cvec')} AS DOUBLE))) AS cosine
  FROM c, q WHERE neighbor_id != query_id
),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM exact_scored
  ) t WHERE rank <= 5
),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, ct.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='ct.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='ct.cvec', b='ct.cvec'))} AS cosine
  FROM embeddings e, cent ct
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM scored_assign
),
assign AS (SELECT vec_id, embedding, centroid_id FROM ranked WHERE rn = 1),
ivf_scored AS (
  SELECT p.vec_id AS query_id, p.rn AS probe_rn, a.vec_id AS neighbor_id,
    {_COS.format(dot=_DOT9.format(a='p.embedding', b='a.embedding'),
                 na=_DOT9.format(a='p.embedding', b='p.embedding'),
                 nb=_DOT9.format(a='a.embedding', b='a.embedding'))} AS cosine
  FROM (SELECT * FROM ranked WHERE rn <= 2 AND vec_id < 20) p
  JOIN assign a
    ON p.centroid_id = a.centroid_id AND a.vec_id != p.vec_id
),
ivf_top_p1 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ivf_scored WHERE probe_rn = 1
  ) t WHERE rank <= 5
),
ivf_top_p2 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ivf_scored
  ) t WHERE rank <= 5
),
h1 AS (
  SELECT e.query_id, COUNT(*) AS hits FROM exact_top e
  JOIN ivf_top_p1 i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
  GROUP BY e.query_id
),
h2 AS (
  SELECT e.query_id, COUNT(*) AS hits FROM exact_top e
  JOIN ivf_top_p2 i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
  GROUP BY e.query_id
)
SELECT b.query_id,
  CAST(COALESCE(h1.hits, 0) AS BIGINT) AS hits_p1,
  CAST(COALESCE(h1.hits, 0) AS DOUBLE) / 5.0 AS recall_p1,
  CAST(COALESCE(h2.hits, 0) AS BIGINT) AS hits_p2,
  CAST(COALESCE(h2.hits, 0) AS DOUBLE) / 5.0 AS recall_p2
FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 20) b
LEFT JOIN h1 ON b.query_id = h1.query_id
LEFT JOIN h2 ON b.query_id = h2.query_id
ORDER BY b.query_id
"""

# IVF+PQ recall sweep (round-7): n_probe 1..4 × {plain, residual}
# encodings, ADC ranking AND the exact-rerank refine stage, all
# replayed exactly. Shared CTEs do the expensive work once (cell
# assignment, both encodings, both scored candidate relations with
# probe_rn exposed); the 8 per-config tails are generated by the
# Python loop below — each is just two windowed top-k's over the
# shared scored relation plus two hit counts vs the exact top-5.
def _ann_recall_sweep_sql() -> str:
    n_cent, n_codes, n_q, k, shortlist = 32, 64, 20, 5, 32
    denom = float(n_q * k)
    shared = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < {n_cent}
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, ct.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='ct.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='ct.cvec', b='ct.cvec'))} AS cosine
  FROM embeddings e, cent ct
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM scored_assign
),
assign AS (SELECT vec_id, embedding, centroid_id FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id, embedding, centroid_id, rn AS probe_rn
  FROM ranked WHERE rn <= 4 AND vec_id < {n_q}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec,
    {_DOT9.format(a='embedding', b='embedding')} AS qn2
  FROM embeddings WHERE vec_id < {n_q}
),
exact_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {_COS.format(dot=_DOT9.format(a='q.qvec', b='c.embedding'),
                 na=_DOT9.format(a='q.qvec', b='q.qvec'),
                 nb=_DOT9.format(a='c.embedding', b='c.embedding'))} AS cosine
  FROM q, embeddings c WHERE c.vec_id != q.query_id
),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM exact_scored
  ) t WHERE rank <= {k}
),
pairs AS (
  SELECT p.vec_id AS query_id, p.probe_rn, a.vec_id AS neighbor_id, a.centroid_id
  FROM probes p JOIN assign a
    ON a.centroid_id = p.centroid_id AND a.vec_id != p.vec_id
),
subs AS (SELECT unnest(range(0, 8)) AS subspace),
cbn_p AS (
  SELECT s.subspace, e.vec_id AS code,
    list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS subvec,
    {_PQ_DOT.format(a="list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8)",
                    b="list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8)")} AS cn2
  FROM embeddings e, subs s WHERE e.vec_id < {n_codes}
),
enc_p AS (
  SELECT vec_id, subspace, code FROM (
    SELECT ex.vec_id, ex.subspace, cbn_p.code,
      ROW_NUMBER() OVER (
        PARTITION BY ex.vec_id, ex.subspace
        ORDER BY {_PQ_L2.format(a='ex.xsub', b='cbn_p.subvec')} ASC, cbn_p.code ASC
      ) AS rn
    FROM (
      SELECT e.vec_id, s.subspace,
        list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
      FROM embeddings e, subs s
    ) ex JOIN cbn_p ON ex.subspace = cbn_p.subspace
  ) t WHERE rn = 1
),
lut_p AS (
  SELECT q.query_id, q.qn2, cbn_p.subspace, cbn_p.code, cbn_p.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cbn_p.subspace * 8 + 1, cbn_p.subspace * 8 + 8)",
                    b='cbn_p.subvec')} AS pdot
  FROM q, cbn_p
),
parts_p AS (
  SELECT pr.query_id, pr.probe_rn, pr.neighbor_id,
    ANY_VALUE(l.qn2) AS qn2,
    list_reduce(list(l.pdot ORDER BY l.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(l.cn2 ORDER BY l.subspace), (acc, v) -> acc + v) AS fold_cn2
  FROM pairs pr
  JOIN enc_p e ON e.vec_id = pr.neighbor_id
  JOIN lut_p l ON l.query_id = pr.query_id
              AND l.subspace = e.subspace AND l.code = e.code
  GROUP BY 1, 2, 3
),
scored_plain AS (
  SELECT query_id, probe_rn, neighbor_id,
    adc_dot / (sqrt(qn2) * sqrt(fold_cn2)) AS adc_score
  FROM parts_p
),
resid AS (
  SELECT a.vec_id, a.centroid_id,
    list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE)) AS rvec
  FROM assign a JOIN cent ct ON a.centroid_id = ct.centroid_id
),
cbn_r AS (
  SELECT s.subspace, r.vec_id AS code,
    list_slice(r.rvec, s.subspace * 8 + 1, s.subspace * 8 + 8) AS subvec,
    {_PQ_DOT.format(a="list_slice(r.rvec, s.subspace * 8 + 1, s.subspace * 8 + 8)",
                    b="list_slice(r.rvec, s.subspace * 8 + 1, s.subspace * 8 + 8)")} AS cn2
  FROM resid r, subs s WHERE r.vec_id < {n_codes}
),
enc_r AS (
  SELECT vec_id, subspace, code FROM (
    SELECT ex.vec_id, ex.subspace, cbn_r.code,
      ROW_NUMBER() OVER (
        PARTITION BY ex.vec_id, ex.subspace
        ORDER BY {_PQ_L2.format(a='ex.xsub', b='cbn_r.subvec')} ASC, cbn_r.code ASC
      ) AS rn
    FROM (
      SELECT r.vec_id, s.subspace,
        list_slice(r.rvec, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
      FROM resid r, subs s
    ) ex JOIN cbn_r ON ex.subspace = cbn_r.subspace
  ) t WHERE rn = 1
),
lut_r AS (
  SELECT q.query_id, q.qn2, cbn_r.subspace, cbn_r.code, cbn_r.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cbn_r.subspace * 8 + 1, cbn_r.subspace * 8 + 8)",
                    b='cbn_r.subvec')} AS pdot
  FROM q, cbn_r
),
ccdot AS (
  SELECT ct.centroid_id, cb.subspace, cb.code,
    {_PQ_DOT.format(a="list_slice(ct.cvec, cb.subspace * 8 + 1, cb.subspace * 8 + 8)",
                    b='cb.subvec')} AS ccdot
  FROM cent ct, cbn_r cb
),
centn AS (
  SELECT centroid_id, {_DOT9.format(a='cvec', b='cvec')} AS cell_cn2 FROM cent
),
qc AS (
  SELECT q.query_id, ct.centroid_id,
    {_DOT9.format(a='q.qvec', b='ct.cvec')} AS base_dot
  FROM q, cent ct
),
parts_r AS (
  SELECT pr.query_id, pr.probe_rn, pr.neighbor_id,
    ANY_VALUE(l.qn2) AS qn2,
    ANY_VALUE(b.base_dot) AS base_dot,
    ANY_VALUE(cn.cell_cn2) AS cell_cn2,
    list_reduce(list(l.pdot ORDER BY l.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(2.0 * cc.ccdot + l.cn2 ORDER BY l.subspace),
                (acc, v) -> acc + v) AS fold_cn2
  FROM pairs pr
  JOIN enc_r e ON e.vec_id = pr.neighbor_id
  JOIN lut_r l ON l.query_id = pr.query_id
              AND l.subspace = e.subspace AND l.code = e.code
  JOIN ccdot cc ON cc.centroid_id = pr.centroid_id
               AND cc.subspace = e.subspace AND cc.code = e.code
  JOIN qc b ON b.query_id = pr.query_id AND b.centroid_id = pr.centroid_id
  JOIN centn cn ON cn.centroid_id = pr.centroid_id
  GROUP BY 1, 2, 3
),
scored_residual AS (
  SELECT query_id, probe_rn, neighbor_id,
    (base_dot + adc_dot) / (sqrt(qn2) * sqrt(cell_cn2 + fold_cn2)) AS adc_score
  FROM parts_r
)"""
    tails = []
    rows = []
    for enc in ("plain", "residual"):
        for p in (1, 2, 3, 4):
            tag = f"{enc}_{p}"
            tails.append(f""",
top_{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_{enc} WHERE probe_rn <= {p}
  ) t WHERE rk <= {k}
),
short_{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_{enc} WHERE probe_rn <= {p}
  ) t WHERE rk <= {shortlist}
),
ref_{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT s.query_id, s.neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY s.query_id ORDER BY x.cosine DESC, s.neighbor_id ASC) AS rk
    FROM short_{tag} s JOIN exact_scored x
      ON x.query_id = s.query_id AND x.neighbor_id = s.neighbor_id
  ) t WHERE rk <= {k}
)""")
            rows.append(f"""
  SELECT '{enc}' AS encoding, CAST({p} AS INTEGER) AS n_probe,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN top_{tag} a ON t.query_id = a.query_id
                          AND t.neighbor_id = a.neighbor_id) AS BIGINT) AS hits_adc,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN top_{tag} a ON t.query_id = a.query_id
                          AND t.neighbor_id = a.neighbor_id) AS DOUBLE) / {denom} AS recall_adc,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN ref_{tag} r ON t.query_id = r.query_id
                          AND t.neighbor_id = r.neighbor_id) AS BIGINT) AS hits_refined,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN ref_{tag} r ON t.query_id = r.query_id
                          AND t.neighbor_id = r.neighbor_id) AS DOUBLE) / {denom} AS recall_refined""")
    return (
        shared
        + "".join(tails)
        + "\nSELECT * FROM ("
        + "\n  UNION ALL".join(rows)
        + "\n) ORDER BY encoding, n_probe"
    )


LLM_ORACLE_SQL["ann_recall_sweep"] = _ann_recall_sweep_sql()


def _trained_chain_parts(
    n_q: int,
    max_probe: int,
    encodings=("p", "r"),
    k: int = 5,
    train_where: str = "",
    serve_where: str = "",
) -> list[str]:
    """Shared CTE chain for the TRAINED index gates: 5 unrolled
    exact-fold Lloyd iterations for the IVF centroids (each step the
    same construct the ``ann_kmeans_step`` oracle already
    hash-matches), 3 unrolled per-subspace iterations per PQ codebook
    (ordered-fold means, dead codes carried forward via LEFT JOIN +
    COALESCE — mirroring pq_train_codebook exact mode), final
    assignment/probes/ground truth for ``n_q`` queries at
    ``max_probe`` cells, and ADC scoring per requested encoding
    (``scored_plain`` / ``scored_residual``). Every CTE is
    MATERIALIZED — DuckDB inlines by default and the 5-deep centroid
    chain re-expands at every reference otherwise (>400 s vs ~3 s).
    Consumers append their own ranking tails.

    ``train_where`` (round-14, the persisted-index gate): a WHERE
    clause restricting the TRAINING corpus — seeds, Lloyd assignment
    passes and PQ-codebook iterations all read only the restricted
    rows, while final assignment, encoding, ground truth and serving
    run over the FULL corpus. This is exactly ``build_ann_index`` on
    the build subset + frozen-codebook ``append`` of the rest
    (llm/ann_index.py): training sees the build corpus, the index
    serves the union. Empty (the default) keeps the emitted SQL
    byte-identical to the pre-round-14 chain.

    ``serve_where`` (round-14, the change-feed sync gate): a WHERE
    clause restricting the SERVED corpus — final assignment, encoding,
    candidate generation and the exact-cosine reference read only the
    surviving rows, while training still reads ``train_where``'s view
    of the ORIGINAL corpus (rows deleted after the build WERE in
    training — exactly ``build_ann_index`` then DV-delete via
    ``sync_from_change_feed``). Queries must survive the restriction
    (the sync gates never delete ids < n_q). Empty keeps the SQL
    byte-identical."""
    n_cent, n_codes = 32, 64
    ivf_iters, pq_iters = 5, 3
    tsrc = "train" if train_where else "embeddings"
    ssrc = "serve" if serve_where else "embeddings"

    # ---- IVF Lloyd chain: cent_t0 (seeds) → cent_t{ivf_iters}
    head = ""
    if serve_where:
        head = f"""
serve AS MATERIALIZED (
  SELECT * FROM embeddings {serve_where}
),"""
    if train_where:
        parts = [
            f"""
WITH {head.lstrip()}
train AS MATERIALIZED (
  SELECT * FROM embeddings {train_where}
),
cent_t0 AS MATERIALIZED (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM {tsrc} WHERE vec_id < {n_cent}
)"""
            if serve_where
            else f"""
WITH train AS MATERIALIZED (
  SELECT * FROM embeddings {train_where}
),
cent_t0 AS MATERIALIZED (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM {tsrc} WHERE vec_id < {n_cent}
)"""
        ]
    else:
        parts = [
            f"""
WITH {head.lstrip()}
cent_t0 AS MATERIALIZED (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < {n_cent}
)"""
            if serve_where
            else f"""
WITH cent_t0 AS MATERIALIZED (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < {n_cent}
)"""
        ]
    for i in range(1, ivf_iters + 1):
        parts.append(f""",
sa_t{i} AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='c.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='c.cvec', b='c.cvec'))} AS cosine
  FROM {tsrc} e, cent_t{i - 1} c
),
asg_t{i} AS MATERIALIZED (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
    FROM sa_t{i}
  ) t WHERE rn = 1
),
cm_t{i} AS MATERIALIZED (
  SELECT centroid_id, CAST(i - 1 AS INTEGER) AS pos,
    list_reduce(list(CAST(embedding[i] AS DOUBLE) ORDER BY vec_id),
                (acc, x) -> acc + x) / CAST(COUNT(*) AS DOUBLE) AS mean_val
  FROM (
    SELECT centroid_id, vec_id, embedding,
      unnest(range(1, len(embedding) + 1)) AS i
    FROM asg_t{i}
  )
  GROUP BY centroid_id, pos
),
cent_t{i} AS MATERIALIZED (
  SELECT centroid_id, list(mean_val ORDER BY pos) AS cvec
  FROM cm_t{i} GROUP BY centroid_id
)""")
    cent = f"cent_t{ivf_iters}"

    # ---- final assignment + probes + ground truth (as in the seed
    # sweep, but against the trained centroids, probe_rn ≤ max probe)
    parts.append(f""",
scored_assign AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, ct.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='ct.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='ct.cvec', b='ct.cvec'))} AS cosine
  FROM {ssrc} e, {cent} ct
),
ranked AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM scored_assign
),
assign AS MATERIALIZED (SELECT vec_id, embedding, centroid_id FROM ranked WHERE rn = 1),
probes AS MATERIALIZED (
  SELECT vec_id, embedding, centroid_id, rn AS probe_rn
  FROM ranked WHERE rn <= {max_probe} AND vec_id < {n_q}
),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qvec,
    {_DOT9.format(a='embedding', b='embedding')} AS qn2
  FROM {ssrc} WHERE vec_id < {n_q}
),
exact_scored AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {_COS.format(dot=_DOT9.format(a='q.qvec', b='c.embedding'),
                 na=_DOT9.format(a='q.qvec', b='q.qvec'),
                 nb=_DOT9.format(a='c.embedding', b='c.embedding'))} AS cosine
  FROM q, {ssrc} c WHERE c.vec_id != q.query_id
),
exact_top AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM exact_scored
  ) t WHERE rank <= {k}
),
pairs AS MATERIALIZED (
  SELECT p.vec_id AS query_id, p.probe_rn, a.vec_id AS neighbor_id, a.centroid_id
  FROM probes p JOIN assign a
    ON a.centroid_id = p.centroid_id AND a.vec_id != p.vec_id
),
subs AS MATERIALIZED (SELECT unnest(range(0, 8)) AS subspace),
resid AS MATERIALIZED (
  SELECT a.vec_id, a.centroid_id,
    list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE)) AS rvec
  FROM assign a JOIN {cent} ct ON a.centroid_id = ct.centroid_id
)""")
    if serve_where:
        # training saw the ORIGINAL corpus (rows deleted after the
        # build WERE in training), so the PQ-training inputs need
        # their own assignment/residual chain over the train relation
        # — the serve-restricted assign/resid above feed ENCODING only
        parts.append(f""",
ranked_train AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM (
    SELECT e.vec_id, e.embedding, ct.centroid_id,
      {_COS.format(dot=_DOT9.format(a='e.embedding', b='ct.cvec'),
                   na=_DOT9.format(a='e.embedding', b='e.embedding'),
                   nb=_DOT9.format(a='ct.cvec', b='ct.cvec'))} AS cosine
    FROM {tsrc} e, {cent} ct
  ) s
),
assign_train AS MATERIALIZED (
  SELECT vec_id, embedding, centroid_id FROM ranked_train WHERE rn = 1
),
resid_train AS MATERIALIZED (
  SELECT a.vec_id, a.centroid_id,
    list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE)) AS rvec
  FROM assign_train a JOIN {cent} ct ON a.centroid_id = ct.centroid_id
)""")

    # ---- PQ training per encoding: src relation exposes (vec_id, v).
    # With train_where, codebook seeds + Lloyd iterations read only
    # the training subset (pqtrain_*); the encode CTEs below keep
    # reading pqsrc_* (the full corpus).
    enc_sources = {"p": (ssrc, "embedding"), "r": ("resid", "rvec")}
    train_sources = {
        "p": (tsrc, "embedding"),
        "r": ("resid_train", "rvec"),
    }
    for enc in encodings:
        src, vcol = enc_sources[enc]
        pqt = (
            f"pqtrain_{enc}"
            if (train_where or serve_where)
            else f"pqsrc_{enc}"
        )
        parts.append(f""",
pqsrc_{enc} AS MATERIALIZED (
  SELECT s.subspace, t.vec_id,
    list_slice(t.{vcol}, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
  FROM {src} t, subs s
)""")
        if serve_where:
            # PQ training reads the TRAIN-side chain, not the serve-
            # restricted encode source (the build preceded the delete)
            t_src, t_vcol = train_sources[enc]
            parts.append(f""",
pqtrain_{enc} AS MATERIALIZED (
  SELECT s.subspace, t.vec_id,
    list_slice(t.{t_vcol}, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
  FROM {t_src} t, subs s
)""")
        elif train_where:
            parts.append(f""",
pqtrain_{enc} AS MATERIALIZED (
  SELECT * FROM pqsrc_{enc} {train_where}
)""")
        parts.append(f""",
cb_{enc}0 AS MATERIALIZED (
  SELECT subspace, vec_id AS code, xsub AS subvec
  FROM {pqt} WHERE vec_id < {n_codes}
)""")
        for j in range(1, pq_iters + 1):
            parts.append(f""",
pe_{enc}{j} AS MATERIALIZED (
  SELECT vec_id, subspace, code, xsub FROM (
    SELECT x.vec_id, x.subspace, c.code, x.xsub,
      ROW_NUMBER() OVER (
        PARTITION BY x.vec_id, x.subspace
        ORDER BY {_PQ_L2.format(a='x.xsub', b='c.subvec')} ASC, c.code ASC
      ) AS rn
    FROM {pqt} x JOIN cb_{enc}{j - 1} c ON x.subspace = c.subspace
  ) t WHERE rn = 1
),
pm_{enc}{j} AS MATERIALIZED (
  SELECT subspace, code, CAST(i - 1 AS INTEGER) AS pos,
    list_reduce(list(CAST(xsub[i] AS DOUBLE) ORDER BY vec_id),
                (acc, x) -> acc + x) / CAST(COUNT(*) AS DOUBLE) AS mv
  FROM (
    SELECT subspace, code, vec_id, xsub, unnest(range(1, 9)) AS i
    FROM pe_{enc}{j}
  )
  GROUP BY subspace, code, pos
),
cbn_{enc}{j} AS MATERIALIZED (
  SELECT subspace, code, list(mv ORDER BY pos) AS subvec
  FROM pm_{enc}{j} GROUP BY subspace, code
),
cb_{enc}{j} AS MATERIALIZED (
  SELECT c.subspace, c.code,
    COALESCE(n.subvec, list_transform(c.subvec, x -> CAST(x AS DOUBLE))) AS subvec
  FROM cb_{enc}{j - 1} c LEFT JOIN cbn_{enc}{j} n
    ON n.subspace = c.subspace AND n.code = c.code
)""")
        parts.append(f""",
cb_{enc} AS MATERIALIZED (
  SELECT subspace, code, subvec,
    {_PQ_DOT.format(a='subvec', b='subvec')} AS cn2
  FROM cb_{enc}{pq_iters}
)""")

    # ---- encode + LUT + ADC scoring (same shapes as the seed sweep,
    # pointed at the trained relations)
    if "p" in encodings:
        parts.append(f""",
enc_p AS MATERIALIZED (
  SELECT vec_id, subspace, code FROM (
    SELECT x.vec_id, x.subspace, c.code,
      ROW_NUMBER() OVER (
        PARTITION BY x.vec_id, x.subspace
        ORDER BY {_PQ_L2.format(a='x.xsub', b='c.subvec')} ASC, c.code ASC
      ) AS rn
    FROM pqsrc_p x JOIN cb_p c ON x.subspace = c.subspace
  ) t WHERE rn = 1
),
lut_p AS MATERIALIZED (
  SELECT q.query_id, q.qn2, cb_p.subspace, cb_p.code, cb_p.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cb_p.subspace * 8 + 1, cb_p.subspace * 8 + 8)",
                    b='cb_p.subvec')} AS pdot
  FROM q, cb_p
),
parts_p AS MATERIALIZED (
  SELECT pr.query_id, pr.probe_rn, pr.neighbor_id,
    ANY_VALUE(l.qn2) AS qn2,
    list_reduce(list(l.pdot ORDER BY l.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(l.cn2 ORDER BY l.subspace), (acc, v) -> acc + v) AS fold_cn2
  FROM pairs pr
  JOIN enc_p e ON e.vec_id = pr.neighbor_id
  JOIN lut_p l ON l.query_id = pr.query_id
              AND l.subspace = e.subspace AND l.code = e.code
  GROUP BY 1, 2, 3
),
scored_plain AS MATERIALIZED (
  SELECT query_id, probe_rn, neighbor_id,
    adc_dot / (sqrt(qn2) * sqrt(fold_cn2)) AS adc_score
  FROM parts_p
)""")
    if "r" in encodings:
        parts.append(f""",
enc_r AS MATERIALIZED (
  SELECT vec_id, subspace, code FROM (
    SELECT x.vec_id, x.subspace, c.code,
      ROW_NUMBER() OVER (
        PARTITION BY x.vec_id, x.subspace
        ORDER BY {_PQ_L2.format(a='x.xsub', b='c.subvec')} ASC, c.code ASC
      ) AS rn
    FROM pqsrc_r x JOIN cb_r c ON x.subspace = c.subspace
  ) t WHERE rn = 1
),
lut_r AS MATERIALIZED (
  SELECT q.query_id, q.qn2, cb_r.subspace, cb_r.code, cb_r.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cb_r.subspace * 8 + 1, cb_r.subspace * 8 + 8)",
                    b='cb_r.subvec')} AS pdot
  FROM q, cb_r
),
ccdot AS MATERIALIZED (
  SELECT ct.centroid_id, cb.subspace, cb.code,
    {_PQ_DOT.format(a="list_slice(ct.cvec, cb.subspace * 8 + 1, cb.subspace * 8 + 8)",
                    b='cb.subvec')} AS ccdot
  FROM {cent} ct, cb_r cb
),
centn AS MATERIALIZED (
  SELECT centroid_id, {_DOT9.format(a='cvec', b='cvec')} AS cell_cn2 FROM {cent}
),
qc AS MATERIALIZED (
  SELECT q.query_id, ct.centroid_id,
    {_DOT9.format(a='q.qvec', b='ct.cvec')} AS base_dot
  FROM q, {cent} ct
),
parts_r AS MATERIALIZED (
  SELECT pr.query_id, pr.probe_rn, pr.neighbor_id,
    ANY_VALUE(l.qn2) AS qn2,
    ANY_VALUE(b.base_dot) AS base_dot,
    ANY_VALUE(cn.cell_cn2) AS cell_cn2,
    list_reduce(list(l.pdot ORDER BY l.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(2.0 * cc.ccdot + l.cn2 ORDER BY l.subspace),
                (acc, v) -> acc + v) AS fold_cn2
  FROM pairs pr
  JOIN enc_r e ON e.vec_id = pr.neighbor_id
  JOIN lut_r l ON l.query_id = pr.query_id
              AND l.subspace = e.subspace AND l.code = e.code
  JOIN ccdot cc ON cc.centroid_id = pr.centroid_id
               AND cc.subspace = e.subspace AND cc.code = e.code
  JOIN qc b ON b.query_id = pr.query_id AND b.centroid_id = pr.centroid_id
  JOIN centn cn ON cn.centroid_id = pr.centroid_id
  GROUP BY 1, 2, 3
),
scored_residual AS MATERIALIZED (
  SELECT query_id, probe_rn, neighbor_id,
    (base_dot + adc_dot) / (sqrt(qn2) * sqrt(cell_cn2 + fold_cn2)) AS adc_score
  FROM parts_r
)""")
    return parts


def _ann_recall_sweep_trained_sql() -> str:
    """Oracle for the TRAINED recall sweep: the shared trained chain
    (``_trained_chain_parts``) + the same ranking tails as
    ``_ann_recall_sweep_sql``, probes {1,2,4,6}, shortlist 24."""
    n_q, k, shortlist = 20, 5, 24
    probes = (1, 2, 4, 6)
    denom = float(n_q * k)
    parts = _trained_chain_parts(n_q, max(probes))
    rows = []
    for enc in ("plain", "residual"):
        for p in probes:
            tag = f"{enc}_{p}"
            parts.append(f""",
top_{tag} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_{enc} WHERE probe_rn <= {p}
  ) t WHERE rk <= {k}
),
short_{tag} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_{enc} WHERE probe_rn <= {p}
  ) t WHERE rk <= {shortlist}
),
ref_{tag} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT s.query_id, s.neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY s.query_id ORDER BY x.cosine DESC, s.neighbor_id ASC) AS rk
    FROM short_{tag} s JOIN exact_scored x
      ON x.query_id = s.query_id AND x.neighbor_id = s.neighbor_id
  ) t WHERE rk <= {k}
)""")
            rows.append(f"""
  SELECT '{enc}' AS encoding, CAST({p} AS INTEGER) AS n_probe,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN top_{tag} a ON t.query_id = a.query_id
                          AND t.neighbor_id = a.neighbor_id) AS BIGINT) AS hits_adc,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN top_{tag} a ON t.query_id = a.query_id
                          AND t.neighbor_id = a.neighbor_id) AS DOUBLE) / {denom} AS recall_adc,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN ref_{tag} r ON t.query_id = r.query_id
                          AND t.neighbor_id = r.neighbor_id) AS BIGINT) AS hits_refined,
    CAST((SELECT COUNT(*) FROM exact_top t
          JOIN ref_{tag} r ON t.query_id = r.query_id
                          AND t.neighbor_id = r.neighbor_id) AS DOUBLE) / {denom} AS recall_refined""")
    return (
        "".join(parts)
        + "\nSELECT * FROM ("
        + "\n  UNION ALL".join(rows)
        + "\n) ORDER BY encoding, n_probe"
    )


LLM_ORACLE_SQL["ann_recall_sweep_trained"] = _ann_recall_sweep_trained_sql()


def _ann_ivfpq_trained_serving_sql() -> str:
    """Oracle for the trained SERVING query: the shared trained chain
    (residual encoding only) + one shortlist-24 ADC rank at
    n_probe=6 + exact-cosine rerank to top-5 with TRUE cosines —
    exactly exact_rerank's tail over scored_residual."""
    n_q, k, shortlist, n_probe = 5, 5, 24, 6
    parts = _trained_chain_parts(n_q, n_probe, encodings=("r",))
    return "".join(parts) + f""",
short_serve AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_residual WHERE probe_rn <= {n_probe}
  ) t WHERE rk <= {shortlist}
)
SELECT query_id, CAST(rk AS INTEGER) AS rank, neighbor_id, cosine FROM (
  SELECT s.query_id, s.neighbor_id, x.cosine, ROW_NUMBER() OVER (
    PARTITION BY s.query_id ORDER BY x.cosine DESC, s.neighbor_id ASC) AS rk
  FROM short_serve s JOIN exact_scored x
    ON x.query_id = s.query_id AND x.neighbor_id = s.neighbor_id
) t WHERE rk <= {k} ORDER BY query_id, rank
"""


LLM_ORACLE_SQL["ann_cosine_ivfpq_trained"] = _ann_ivfpq_trained_serving_sql()


def _ann_index_incremental_sql() -> str:
    """Oracle for the persisted-index growth gate: the trained chain
    restricted to the BUILD subset (``train_where`` — seeds, Lloyd
    passes and PQ iterations see only vec_id % 3 <> 0) while final
    assignment/encoding/serving run over the FULL corpus — i.e.
    build-then-frozen-append re-derived relationally. The serving
    tail is the trained one (n_probe=6, shortlist 24, exact rerank);
    the result is emitted once per variant because the Spark gate's
    two arms (persisted-grown vs scratch-encoded union) must be
    identical — a drifted append (stale codebook, missed cell,
    re-encoded history) breaks the incremental arm's hash here."""
    n_q, k, shortlist, n_probe = 5, 5, 24, 6
    parts = _trained_chain_parts(
        n_q, n_probe, encodings=("r",), train_where="WHERE vec_id % 3 <> 0"
    )
    return "".join(parts) + f""",
short_serve AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_residual WHERE probe_rn <= {n_probe}
  ) t WHERE rk <= {shortlist}
),
served AS MATERIALIZED (
  SELECT query_id, CAST(rk AS INTEGER) AS rank, neighbor_id, cosine FROM (
    SELECT s.query_id, s.neighbor_id, x.cosine, ROW_NUMBER() OVER (
      PARTITION BY s.query_id ORDER BY x.cosine DESC, s.neighbor_id ASC) AS rk
    FROM short_serve s JOIN exact_scored x
      ON x.query_id = s.query_id AND x.neighbor_id = s.neighbor_id
  ) t WHERE rk <= {k}
)
SELECT v.variant, s.query_id, s.rank, s.neighbor_id, s.cosine
FROM served s
CROSS JOIN (VALUES ('incremental'), ('scratch')) AS v(variant)
ORDER BY v.variant, s.query_id, s.rank
"""


LLM_ORACLE_SQL["ann_index_incremental"] = _ann_index_incremental_sql()


def _ann_index_cdf_sync_sql() -> str:
    """Oracle for the change-feed sync gate: training restricted to
    the BUILD subset (``train_where`` — vec_id % 3 <> 0, which at
    build time includes the rows deleted later), serving restricted
    to the FINAL snapshot (``serve_where`` — the %5/≥10 slab gone, so
    a ghost neighbor the sync failed to delete, or a missing append,
    diverges immediately). Same trained serving tail (n_probe=6,
    shortlist 24, exact rerank) as the incremental gate, single
    variant."""
    n_q, k, shortlist, n_probe = 5, 5, 24, 6
    parts = _trained_chain_parts(
        n_q,
        n_probe,
        encodings=("r",),
        train_where="WHERE vec_id % 3 <> 0",
        serve_where="WHERE NOT (vec_id % 5 = 0 AND vec_id >= 10)",
    )
    return "".join(parts) + f""",
short_serve AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC) AS rk
    FROM scored_residual WHERE probe_rn <= {n_probe}
  ) t WHERE rk <= {shortlist}
)
SELECT query_id, CAST(rk AS INTEGER) AS rank, neighbor_id, cosine FROM (
  SELECT s.query_id, s.neighbor_id, x.cosine, ROW_NUMBER() OVER (
    PARTITION BY s.query_id ORDER BY x.cosine DESC, s.neighbor_id ASC) AS rk
  FROM short_serve s JOIN exact_scored x
    ON x.query_id = s.query_id AND x.neighbor_id = s.neighbor_id
) t WHERE rk <= {k}
ORDER BY query_id, rank
"""


LLM_ORACLE_SQL["ann_index_cdf_sync"] = _ann_index_cdf_sync_sql()


# The recommended serving query: IVF(32 cells, n_probe=2) × PQ/ADC
# shortlist(64 codes, 32) × exact-rerank top-5 with TRUE cosines.
# Same CTE patterns as the sweep, one configuration, refined output.
LLM_ORACLE_SQL["ann_cosine_ivfpq_refined"] = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < 32
),
scored_assign AS (
  SELECT e.vec_id, e.embedding, ct.centroid_id,
    {_COS.format(dot=_DOT9.format(a='e.embedding', b='ct.cvec'),
                 na=_DOT9.format(a='e.embedding', b='e.embedding'),
                 nb=_DOT9.format(a='ct.cvec', b='ct.cvec'))} AS cosine
  FROM embeddings e, cent ct
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
  FROM scored_assign
),
assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id, centroid_id FROM ranked WHERE rn <= 2 AND vec_id < 5
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec,
    {_DOT9.format(a='embedding', b='embedding')} AS qn2
  FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a
    ON a.centroid_id = p.centroid_id AND a.vec_id != p.vec_id
),
subs AS (SELECT unnest(range(0, 8)) AS subspace),
cbn AS (
  SELECT s.subspace, e.vec_id AS code,
    list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS subvec,
    {_PQ_DOT.format(a="list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8)",
                    b="list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8)")} AS cn2
  FROM embeddings e, subs s WHERE e.vec_id < 64
),
enc AS (
  SELECT vec_id, subspace, code FROM (
    SELECT ex.vec_id, ex.subspace, cbn.code,
      ROW_NUMBER() OVER (
        PARTITION BY ex.vec_id, ex.subspace
        ORDER BY {_PQ_L2.format(a='ex.xsub', b='cbn.subvec')} ASC, cbn.code ASC
      ) AS rn
    FROM (
      SELECT e.vec_id, s.subspace,
        list_slice(e.embedding, s.subspace * 8 + 1, s.subspace * 8 + 8) AS xsub
      FROM embeddings e, subs s
    ) ex JOIN cbn ON ex.subspace = cbn.subspace
  ) t WHERE rn = 1
),
lut AS (
  SELECT q.query_id, q.qn2, cbn.subspace, cbn.code, cbn.cn2,
    {_PQ_DOT.format(a="list_slice(q.qvec, cbn.subspace * 8 + 1, cbn.subspace * 8 + 8)",
                    b='cbn.subvec')} AS pdot
  FROM q, cbn
),
parts AS (
  SELECT pr.query_id, pr.neighbor_id,
    ANY_VALUE(l.qn2) AS qn2,
    list_reduce(list(l.pdot ORDER BY l.subspace), (acc, v) -> acc + v) AS adc_dot,
    list_reduce(list(l.cn2 ORDER BY l.subspace), (acc, v) -> acc + v) AS fold_cn2
  FROM pairs pr
  JOIN enc e ON e.vec_id = pr.neighbor_id
  JOIN lut l ON l.query_id = pr.query_id
            AND l.subspace = e.subspace AND l.code = e.code
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY adc_dot / (sqrt(qn2) * sqrt(fold_cn2)) DESC, neighbor_id ASC
    ) AS rk FROM parts
  ) t WHERE rk <= 32
),
refined AS (
  SELECT s.query_id, s.neighbor_id,
    {_COS.format(dot=_DOT9.format(a='q.qvec', b='c.embedding'),
                 na=_DOT9.format(a='q.qvec', b='q.qvec'),
                 nb=_DOT9.format(a='c.embedding', b='c.embedding'))} AS cosine
  FROM short s
  JOIN q ON q.query_id = s.query_id
  JOIN embeddings c ON c.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM refined
) t WHERE rank <= 5
ORDER BY query_id, rank
"""


# DSIR importance: hashed unigram+bigram buckets (md5 % 1024, 'dsir'
# salt), integer bucket masses against the en-target and whole-corpus
# models, one IEEE-exact multiply/divide for the surrogate score.
LLM_ORACLE_SQL["text_dsir_importance"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
uni AS (
  SELECT doc_id, '1|' || u.w AS gram FROM toks, unnest(ws) AS u(w)
),
bi AS (
  SELECT doc_id, '2|' || g AS gram FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS g
    FROM toks
  )
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
db AS (
  SELECT doc_id,
         ('0x' || substring(md5('dsir' || gram), 1, 8))::BIGINT % 1024 AS bucket,
         COUNT(*) AS cnt
  FROM grams GROUP BY doc_id, bucket
),
tmodel AS (
  SELECT bucket, SUM(cnt) AS tcnt  -- lint: sum-ok (multiplied then CAST at output)
  FROM db JOIN documents USING (doc_id) WHERE lang = 'en'
  GROUP BY bucket
),
pmodel AS (SELECT bucket, SUM(cnt) AS pcnt FROM db GROUP BY bucket),  -- lint: sum-ok (multiplied then CAST at output)
tot AS (
  SELECT CAST((SELECT SUM(tcnt) FROM tmodel) AS BIGINT) AS T,  -- lint: sum-ok (outer CAST)
         CAST((SELECT SUM(pcnt) FROM pmodel) AS BIGINT) AS P  -- lint: sum-ok (outer CAST)
),
scored AS (
  SELECT db.doc_id,
    CAST(SUM(cnt) AS BIGINT) AS n_grams,
    CAST(SUM(cnt * COALESCE(tcnt, 0)) AS BIGINT) AS target_mass,
    CAST(SUM(cnt * COALESCE(pcnt, 0)) AS BIGINT) AS proposal_mass
  FROM db LEFT JOIN tmodel USING (bucket) LEFT JOIN pmodel USING (bucket)
  GROUP BY db.doc_id
)
SELECT s.doc_id, s.n_grams, s.target_mass, s.proposal_mass,
  (CAST(s.target_mass + 1 AS DOUBLE) * CAST(tot.P + 1 AS DOUBLE))
    / (CAST(s.proposal_mass + 1 AS DOUBLE) * CAST(tot.T + 1 AS DOUBLE)) AS importance
FROM scored s, tot
ORDER BY s.doc_id
"""

# DSIR top-25% selection: same scored relation, threshold = exact
# percentile(0.75) over the 256 hash-smallest docs (the bounded-state
# global_sampled_quantiles sample — md5('dsir-thr'||id) order), ties
# on the threshold broken by md5('dsir-tie'||id) % 2 = 0. The
# importance double, the sampled threshold, and the tie hash all
# reproduce bit-for-bit, so the boolean hashes too.
LLM_ORACLE_SQL["text_dsir_select"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
uni AS (
  SELECT doc_id, '1|' || u.w AS gram FROM toks, unnest(ws) AS u(w)
),
bi AS (
  SELECT doc_id, '2|' || g AS gram FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS g
    FROM toks
  )
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
db AS (
  SELECT doc_id,
         ('0x' || substring(md5('dsir' || gram), 1, 8))::BIGINT % 1024 AS bucket,
         COUNT(*) AS cnt
  FROM grams GROUP BY doc_id, bucket
),
tmodel AS (
  SELECT bucket, SUM(cnt) AS tcnt  -- lint: sum-ok (multiplied then CAST at output)
  FROM db JOIN documents USING (doc_id) WHERE lang = 'en'
  GROUP BY bucket
),
pmodel AS (SELECT bucket, SUM(cnt) AS pcnt FROM db GROUP BY bucket),  -- lint: sum-ok (multiplied then CAST at output)
tot AS (
  SELECT CAST((SELECT SUM(tcnt) FROM tmodel) AS BIGINT) AS T,  -- lint: sum-ok (outer CAST)
         CAST((SELECT SUM(pcnt) FROM pmodel) AS BIGINT) AS P  -- lint: sum-ok (outer CAST)
),
scored AS (
  SELECT db.doc_id,
    CAST(SUM(cnt) AS BIGINT) AS n_grams,
    CAST(SUM(cnt * COALESCE(tcnt, 0)) AS BIGINT) AS target_mass,
    CAST(SUM(cnt * COALESCE(pcnt, 0)) AS BIGINT) AS proposal_mass
  FROM db LEFT JOIN tmodel USING (bucket) LEFT JOIN pmodel USING (bucket)
  GROUP BY db.doc_id
),
fs AS (
  SELECT s.doc_id, s.n_grams, s.target_mass, s.proposal_mass,
    (CAST(s.target_mass + 1 AS DOUBLE) * CAST(tot.P + 1 AS DOUBLE))
      / (CAST(s.proposal_mass + 1 AS DOUBLE) * CAST(tot.T + 1 AS DOUBLE)) AS importance
  FROM scored s, tot
),
samp AS (
  SELECT importance,
         row_number() OVER (
           ORDER BY ('0x' || substring(md5('dsir-thr' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS rn
  FROM fs
),
thr AS (
  SELECT percentile_cont(0.75) WITHIN GROUP (ORDER BY importance) AS t
  FROM samp WHERE rn <= 256
)
SELECT fs.doc_id, fs.n_grams, fs.target_mass, fs.proposal_mass, fs.importance,
  (fs.importance > thr.t
   OR (fs.importance = thr.t
       AND ('0x' || substring(md5('dsir-tie' || CAST(fs.doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0)
  ) AS selected
FROM fs, thr
ORDER BY fs.doc_id
"""

# Real resize: 8x8 nearest sample of the 16x16 formula image — source
# pixel for cell (y, x, ch) is p = (2y*16 + 2x)*3 + ch.
LLM_ORACLE_SQL["mm_resize_real"] = """
WITH cell AS (
  SELECT d.doc_id, t.i, ch.c,
    (d.doc_id * 7
     + (((t.i // 8) * 2 * 16 + (t.i % 8) * 2) * 3 + ch.c) * 13) % 256 AS v
  FROM documents d, generate_series(0, 63) AS t(i), generate_series(0, 2) AS ch(c)
)
SELECT doc_id,
       8 AS width, 8 AS height, 3 AS channels,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       CAST(MAX(CASE WHEN i = 0 AND c = 0 THEN v END) AS INTEGER) AS corner_tl,
       CAST(MAX(CASE WHEN i = 63 AND c = 2 THEN v END) AS INTEGER) AS corner_br
FROM cell
GROUP BY doc_id
ORDER BY doc_id
"""

# CCNet tertiles over the charlm scores: thresholds are exact
# percentiles over the 256 hash-smallest docs (the bounded-state
# global_sampled_quantiles sample — md5('ccnet-thr'||id) order, the
# same rows in both engines); percentile_cont shares Spark's
# a + f*(b-a) interpolation (a12 convention), and 2.0/3.0 is the
# same IEEE double both sides, so the bucket boundaries agree
# bit-for-bit.
LLM_ORACLE_SQL["text_ccnet_buckets"] = """
WITH big AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS bg
  FROM (
    SELECT doc_id, text, unnest(range(1, length(text))) AS i
    FROM documents WHERE length(text) >= 2
  ) t
),
m AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM big GROUP BY bg),
scored AS (
  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
    CAST(SUM(m.cnt) AS BIGINT) AS hit_sum,
    CAST(SUM(m.cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_df
  FROM big b JOIN m USING (bg)
  GROUP BY b.doc_id
),
samp AS (
  SELECT avg_df,
         row_number() OVER (
           ORDER BY ('0x' || substring(md5('ccnet-thr' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS rn
  FROM scored
),
thr AS (
  SELECT percentile_cont(2.0/3.0) WITHIN GROUP (ORDER BY avg_df) AS p_head,
         percentile_cont(1.0/3.0) WITHIN GROUP (ORDER BY avg_df) AS p_mid
  FROM samp WHERE rn <= 256
)
SELECT s.doc_id, s.n_ngrams, s.hit_sum, s.avg_df,
  CASE WHEN s.avg_df >= t.p_head THEN 'head'
       WHEN s.avg_df >= t.p_mid THEN 'middle'
       ELSE 'tail' END AS bucket
FROM scored s, thr t
ORDER BY s.doc_id
"""

# Epoch plan: integer token sums, sqrt weight, group-ordered
# normalizing fold, then one multiply/divide/min chain per row — all
# IEEE-exact, so even the double epochs column hash-matches.
LLM_ORACLE_SQL["sample_epoch_plan"] = """
WITH inv AS (
  SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
  FROM documents GROUP BY lang
),
w AS (
  SELECT *, sqrt(CAST(available_tokens AS DOUBLE)) AS w_raw FROM inv
),
t AS (
  SELECT list_reduce(list(w_raw ORDER BY grp), (acc, x) -> acc + x) AS w_total FROM w
)
SELECT grp AS lang, n_docs, available_tokens, w_raw,
  w_raw / w_total AS weight,
  100000.0 * (w_raw / w_total) AS ideal_tokens,
  least(4.0, (100000.0 * (w_raw / w_total)) / CAST(available_tokens AS DOUBLE)) AS epochs,
  CAST(floor(least(100000.0 * (w_raw / w_total),
                   CAST(available_tokens AS DOUBLE) * 4.0)) AS BIGINT) AS planned_tokens,
  (100000.0 * (w_raw / w_total)) > (CAST(available_tokens AS DOUBLE) * 4.0) AS capped
FROM w, t
ORDER BY lang
"""

# Real frame sampling: frame f of doc d has pixel p =
# (d*7 + f*19 + p*13) % 256 over an 8x8 RGB frame (192 positions);
# frames 0..(4 + d%3 - 1), every 2nd sampled.
LLM_ORACLE_SQL["mm_frames_real"] = """
WITH fr AS (
  SELECT d.doc_id, f.f AS frame_idx
  FROM documents d, generate_series(0, 6) AS f(f)
  WHERE f.f < 4 + d.doc_id % 3 AND f.f % 2 = 0
),
px AS (
  SELECT fr.doc_id, fr.frame_idx,
    CAST(SUM((fr.doc_id * 7 + fr.frame_idx * 19 + p.p * 13) % 256) AS BIGINT)
      AS pixel_sum
  FROM fr, generate_series(0, 191) AS p(p)
  GROUP BY fr.doc_id, fr.frame_idx
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       8 AS width, 8 AS height, pixel_sum
FROM px
ORDER BY doc_id, frame_idx
"""

# Real audio decode: doc d carries 256 + (d%4)*64 mono PCM16 samples
# with s[i] = (d*31 + i*17) % 65536 - 32768; features are integer
# (energy, peak, sign-change count) plus one IEEE sqrt-division rms.
LLM_ORACLE_SQL["mm_audio_features"] = """
WITH base AS (SELECT doc_id, 256 + (doc_id % 4) * 64 AS n FROM documents),
s AS (
  SELECT b.doc_id, i.i, ((b.doc_id * 31 + i.i * 17) % 65536) - 32768 AS v, b.n
  FROM base b, generate_series(0, 447) AS i(i) WHERE i.i < b.n
),
feat AS (
  SELECT doc_id, MAX(n) AS n,
    CAST(SUM(v * v) AS BIGINT) AS energy,
    CAST(MAX(abs(v)) AS INTEGER) AS peak
  FROM s GROUP BY doc_id
),
lagged AS (
  SELECT doc_id, v, LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM s
),
zc AS (
  SELECT doc_id,
    CAST(COUNT(*) FILTER (WHERE sign(v) * sign(prev) < 0) AS INTEGER)
      AS zero_crossings
  FROM lagged GROUP BY doc_id
)
SELECT f.doc_id, 16000 AS sample_rate, CAST(f.n AS INTEGER) AS n_frames,
  1 AS n_channels, f.energy, f.peak, z.zero_crossings,
  sqrt(CAST(f.energy AS DOUBLE) / CAST(f.n AS DOUBLE)) AS rms
FROM feat f JOIN zc z USING (doc_id)
ORDER BY f.doc_id
"""
