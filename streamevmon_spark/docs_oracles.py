"""DuckDB oracles for the training-data-pipeline operators
(documents / embeddings tables).

Determinism contracts with the Spark implementations:
- hashes: functions/porthash.hex32_sql is a single SQL fragment valid in
  both dialects (md5/substr/instr/arithmetic only);
- ratios/similarities: integer-derived numerators/denominators, one
  double division -> bit-exact;
- dot products: ascending-index left fold over doubles; DuckDB's
  list_reduce seeds with the first element, Spark's aggregate seeds with
  0.0 — identical because 0.0 + x is exact.
"""

from __future__ import annotations

from streamevmon_spark.functions.porthash import hex32_sql
from streamevmon_spark.operators.dedup import MINHASH_BAND_ROWS, MINHASH_K
from streamevmon_spark.operators.textstats import (
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_REGEX,
)

_TOKS = "string_split(text, ' ')"
_SHINGLE_LIST = (
    "list_distinct([array_to_string(list_slice("
    f"{_TOKS}, j + 1, j + 3), ' ') "
    f"FOR j IN range(0, greatest(len({_TOKS}) - 2, 1))])"
)


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def token_counts_oracle() -> str:
    return f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}', 0)) AS BIGINT)
           AS regex_tokens,
       CAST(length(text) AS BIGINT) AS chars
FROM documents
"""


def quality_scores_oracle() -> str:
    stops = _sql_list(STOPWORDS)
    return f"""
WITH t AS (
    SELECT doc_id, text, {_TOKS} AS toks,
           CAST(length(text) AS BIGINT) AS nch
    FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       nch AS n_chars_m,
       CAST(nch - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
           AS mean_token_len,
       CAST(len(list_filter(toks, x -> list_contains({stops}, x)))
            AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
       CAST(nch - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
            AS DOUBLE) / CAST(nch AS DOUBLE) AS punct_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
           AS distinct_ratio,
       CAST(len(list_intersect(list_distinct(toks), {stops})) AS BIGINT)
           AS distinct_stopwords
FROM t
"""


def lang_id_oracle() -> str:
    score = {
        lang: (
            f"CAST(len(list_intersect(list_distinct({_TOKS}), "
            f"{_sql_list(markers)})) AS BIGINT)"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    return f"""
WITH s AS (
    SELECT doc_id,
           {score['en']} AS score_en,
           {score['de']} AS score_de,
           {score['fr']} AS score_fr
    FROM documents
)
SELECT doc_id, score_en, score_de, score_fr,
       CASE WHEN greatest(score_en, score_de, score_fr) = 0 THEN 'und'
            WHEN score_en = greatest(score_en, score_de, score_fr)
                THEN 'en'
            WHEN score_de = greatest(score_en, score_de, score_fr)
                THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM s
"""


def fingerprints_oracle() -> str:
    h = hex32_sql("s")
    return f"""
SELECT doc_id,
       md5(lower(text)) AS canonical_md5,
       CAST(list_min(list_transform({_SHINGLE_LIST}, s -> {h})) AS BIGINT)
           AS min_shingle_hash
FROM documents
"""


def exact_dedup_oracle() -> str:
    return """
SELECT md5(text) AS text_md5,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS dup_count
FROM documents GROUP BY md5(text)
"""


_SHINGLES_CTE = f"""
sh AS (
    SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT doc_a, doc_b,
           CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
"""


def ngram_jaccard_oracle(threshold: float = 0.2) -> str:
    return f"""
WITH {_SHINGLES_CTE}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


def ngram_jaccard_capped_oracle(
    threshold: float = 0.2, max_doc_freq: int = 50
) -> str:
    """Document-frequency-capped Jaccard: shingles appearing in more than
    ``max_doc_freq`` docs are dropped before the self-join on BOTH the
    numerator and the denominator — the identical semantics as
    operators/dedup.ngram_jaccard_pairs(max_doc_freq=...)."""
    return f"""
WITH sh0 AS (
    SELECT doc_id, unnest({_SHINGLE_LIST}) AS shingle FROM documents
),
rare AS (
    SELECT shingle FROM sh0 GROUP BY shingle
    HAVING count(*) <= {max_doc_freq}
),
sh AS (SELECT s.doc_id, s.shingle FROM sh0 s JOIN rare r USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE) >= {threshold}
"""


def minhash_lsh_oracle(
    threshold: float = 0.2,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
) -> str:
    mins = ", ".join(
        "min(" + hex32_sql(f"concat('{i}:', shingle)") + f") AS mh{i}"
        for i in range(k)
    )
    n_bands = k // band_rows
    band_keys = ", ".join(
        "concat_ws('_', "
        + str(b)
        + ", "
        + ", ".join(f"mh{b * band_rows + r}" for r in range(band_rows))
        + ")"
        for b in range(n_bands)
    )
    return f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS (
    SELECT doc_id, unnest([{band_keys}]) AS band_key FROM sig
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, j.jaccard
FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= {threshold}
"""


def simhash_oracle() -> str:
    h = hex32_sql("token")
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    fp = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
hashed AS (SELECT doc_id, {h} AS h FROM tok),
bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
"""


def simhash_pairs_oracle(max_hamming: int = 6) -> str:
    return f"""
WITH fp AS ({simhash_oracle()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)


def curate_corpus_oracle(
    min_tokens: int = 20,
    max_stopword_ratio: float = 0.6,
    min_distinct_ratio: float = 0.3,
    lang: str = "en",
) -> str:
    """Composed pipeline oracle: quality gate + exact dedup + language
    filter + embedding attach (norm as the oracle-comparable scalar)."""
    norm = _DOT.format(a="e.embedding", b="e.embedding")
    return f"""
WITH q AS ({quality_scores_oracle()}),
lid AS ({lang_id_oracle()}),
kept AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                   AS rk
        FROM documents
    ) WHERE rk = 1
)
SELECT k.doc_id, k.text, q.n_tokens, q.stopword_ratio, q.distinct_ratio,
       l.lang_pred, sqrt({norm}) AS emb_norm
FROM kept k
JOIN q ON q.doc_id = k.doc_id
JOIN lid l ON l.doc_id = k.doc_id
LEFT JOIN embeddings e ON e.vec_id = k.doc_id
WHERE q.n_tokens >= {min_tokens}
  AND q.stopword_ratio <= {max_stopword_ratio}
  AND q.distinct_ratio >= {min_distinct_ratio}
  AND l.lang_pred = '{lang}'
"""


def cosine_topk_oracle(n_queries: int = 10, k: int = 5) -> str:
    dot_qv = _DOT.format(a="q.embedding", b="v.embedding")
    norm = _DOT.format(a="embedding", b="embedding")
    return f"""
WITH n AS (
    SELECT vec_id, embedding, sqrt({norm}) AS nrm FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding, nrm FROM n
      WHERE vec_id < {n_queries}),
scored AS (
    SELECT q.query_id, v.vec_id,
           {_DOT.format(a='q.embedding', b='v.embedding')}
               / (q.nrm * v.nrm) AS cosine
    FROM n v, q WHERE v.vec_id != q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_oracle(threshold: float = 0.9) -> str:
    norm = _DOT.format(a="embedding", b="embedding")
    return f"""
WITH n AS (
    SELECT vec_id, embedding, sqrt({norm}) AS nrm FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_DOT.format(a='a.embedding', b='b.embedding')}
           / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_DOT.format(a='a.embedding', b='b.embedding')}
          / (a.nrm * b.nrm) >= {threshold}
"""


def lsh_ann_topk_oracle(
    n_queries: int = 10,
    k: int = 5,
    n_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    seed: int = 1,
) -> str:
    """Full DuckDB mirror of operators/similarity.lsh_ann_topk: the
    deterministic hyperplanes are pure-Python constants, so the oracle
    embeds the identical double literals and evaluates the identical
    ascending-index fold per sign bit (0.0-seeded in Spark vs
    first-element-seeded list_reduce — equal because 0.0 + x is exact),
    then the same candidate bucket join + exact cosine re-rank."""
    from streamevmon_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_tables * bits_per_table, seed)

    def dot_lit(p: list[float]) -> str:
        arr = "[" + ", ".join(repr(x) for x in p) + "]"
        return (
            f"list_reduce(list_transform(list_zip(embedding, {arr}), "
            "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
            "(x, y) -> x + y)"
        )

    keys = []
    for t in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {dot_lit(planes[t * bits_per_table + r])} > 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(bits_per_table)
        )
        keys.append(f"'{t}_' || CAST({bits} AS VARCHAR)")
    norm = _DOT.format(a="embedding", b="embedding")
    return f"""
WITH n AS (
    SELECT vec_id, embedding, sqrt({norm}) AS nrm,
           unnest([{", ".join(keys)}]) AS bucket
    FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, bucket
    FROM n WHERE vec_id < {n_queries}
),
cand AS (
    SELECT DISTINCT q.query_id, q.q_emb, q.q_nrm, n.vec_id, n.embedding,
           n.nrm
    FROM n JOIN q USING (bucket)
    WHERE n.vec_id != q.query_id
),
scored AS (
    SELECT query_id, vec_id,
           {_DOT.format(a='q_emb', b='embedding')} / (q_nrm * nrm)
               AS cosine
    FROM cand
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def ivf_ann_topk_oracle(
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 2,
    train_iters: int = 2,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """Full DuckDB mirror of operators/similarity.ivf_ann_topk: the
    centroids are embedded as identical double literals; cell scores
    sort DESC over (d, -c) structs in both engines (field-by-field
    comparison, ascending-cell tie-break), the corpus keeps its single
    best cell, queries probe the top n_probe.

    With ``train_iters`` > 0 the literals come from the NumPy k-means
    twin (``train_ivf_centroids_numpy``) over the gate's sf0.01
    embeddings parquet — bit-identical to the engine's distributed
    trainer because every cross-row reduction in both is integer-exact
    (see train_ivf_centroids)."""
    from streamevmon_spark.operators.similarity import (
        _ivf_centroids,
        train_ivf_centroids_numpy,
    )

    if train_iters > 0:
        cents = train_ivf_centroids_numpy(
            f"{sf_dir}/embeddings.parquet", n_cells, train_iters, dim,
            seed,
        )
    else:
        cents = _ivf_centroids(dim, n_cells, seed)
    structs = ", ".join(
        "{d: "
        + _DOT.format(
            a="embedding", b="[" + ", ".join(repr(x) for x in p) + "]"
        )
        + f", nc: {-c}}}"
        for c, p in enumerate(cents)
    )
    norm = _DOT.format(a="embedding", b="embedding")
    return f"""
WITH n AS (
    SELECT vec_id, embedding, sqrt({norm}) AS nrm,
           list_sort([{structs}], 'DESC') AS cells
    FROM embeddings
),
corpus AS (
    SELECT vec_id, embedding, nrm, -(cells[1].nc) AS cell FROM n
),
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
           unnest(list_transform(cells[1:{n_probe}], s -> -s.nc)) AS cell
    FROM n WHERE vec_id < {n_queries}
),
scored AS (
    SELECT q.query_id, c.vec_id,
           {_DOT.format(a='q.q_emb', b='c.embedding')} / (q.q_nrm * c.nrm)
               AS cosine
    FROM corpus c JOIN q USING (cell)
    WHERE c.vec_id != q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


_KIND = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' "
    "WHEN 1 THEN 'audio' ELSE 'video' END"
)


def media_decode_oracle() -> str:
    """Byte-level fake-decode features re-derived from the text column
    (the synthetic payload is the UTF-8 text repeated 4x, and the corpus
    is pure ASCII, so per-character codepoints == payload bytes;
    repetition scales n_bytes/sum by 4 and leaves min/max/distinct
    unchanged). byte_mean divides the identical integer operands NumPy
    divides (4*sum / 4*len), so the double is bit-exact."""
    return f"""
WITH b AS (
    SELECT doc_id AS media_id, {_KIND} AS kind,
        list_transform(string_split(text, ''), c -> unicode(c)) AS bl,
        octet_length(encode(text)) AS tlen
    FROM documents
)
SELECT media_id, kind,
    CAST(4 * tlen AS BIGINT) AS n_bytes,
    CAST(4 * list_sum(bl) AS DOUBLE) / CAST(4 * tlen AS DOUBLE)
        AS byte_mean,
    CAST(list_min(bl) AS INT) AS byte_min,
    CAST(list_max(bl) AS INT) AS byte_max,
    CAST(len(list_distinct(bl)) AS INT) AS distinct_bytes
FROM b
"""


def media_frame_digests_oracle(
    frame_bytes: int = 256, every_n: int = 2
) -> str:
    """Frame-sampling oracle on scalar columns (md5 + length of each
    sampled frame instead of the raw binary — blob CSV canon differs
    between pandas sources, digests don't): reconstruct the payload
    (text x4), chunk it with the identical ceil-division, sample every
    ``every_n``-th chunk."""
    return f"""
WITH v AS (
    -- DuckDB has no BLOB substring; the corpus is pure ASCII, so the
    -- VARCHAR payload's characters ARE the payload bytes (md5 of the
    -- string hashes the same bytes Spark's md5 of the binary does)
    SELECT doc_id AS media_id, repeat(text, 4) AS payload
    FROM documents WHERE {_KIND} = 'video'
),
f AS (
    SELECT media_id, payload,
        unnest(range(0,
            (length(payload) + {frame_bytes} - 1) // {frame_bytes},
            {every_n})) AS frame_idx
    FROM v
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
    CAST(length(substring(payload, CAST(frame_idx * {frame_bytes} + 1
        AS BIGINT), {frame_bytes})) AS INT) AS frame_bytes,
    md5(substring(payload, CAST(frame_idx * {frame_bytes} + 1 AS BIGINT),
        {frame_bytes})) AS frame_md5
FROM f
"""


def media_decode_real_oracle() -> str:
    """Closed-form mirror of decode_image over the synth_bmp_media
    corpus (operators/multimodal.synth_bmp_media): the BMP pixels are
    channel-equal v(x, y) = (doc_id*3 + y*7 + x*11) % 256, so the
    Rec.601 integer luma is v itself and the decoded pixel_mean is the
    plain average of v over the w x h grid — regenerated here without
    touching any image bytes, which is exactly what makes a REAL
    decoder drift detectable."""
    return """
WITH dims AS (
    SELECT doc_id AS media_id,
           13 + doc_id % 7 AS w,
           5 + doc_id % 6 AS h
    FROM documents
),
ys AS (
    SELECT media_id, w, h, unnest(range(0, h)) AS yy FROM dims
),
px AS (
    SELECT media_id, w, h, yy, unnest(range(0, w)) AS xx FROM ys
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       'RGB' AS mode,
       AVG((media_id * 3 + yy * 7 + xx * 11) % 256) AS pixel_mean
FROM px
GROUP BY media_id, w, h
"""


# --------------------------------------------------------------------------
# sampling / normalization / clustering (operators/sampling.py, dedup.py)

def _sample_key_sql(seed: str = "s1") -> str:
    return hex32_sql(f"concat('{seed}', ':', CAST(doc_id AS STRING))")


def sample_hash_oracle(rate: float, seed: str = "s1") -> str:
    cutoff = int(rate * (1 << 32))
    return f"""
SELECT doc_id, text, lang, source, n_chars,
       CAST({_sample_key_sql(seed)} AS BIGINT) AS sample_key
FROM documents
WHERE {_sample_key_sql(seed)} < {cutoff}
"""


def sample_stratified_oracle(
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    seed: str = "s1",
) -> str:
    whens = " ".join(
        f"WHEN {stratum_col} = '{v}' THEN {int(r * (1 << 32))}"
        for v, r in sorted(rates.items())
    )
    cutoff = f"CASE {whens} ELSE {int(default_rate * (1 << 32))} END"
    return f"""
SELECT doc_id, text, lang, source, n_chars,
       CAST({_sample_key_sql(seed)} AS BIGINT) AS sample_key
FROM documents
WHERE {_sample_key_sql(seed)} < {cutoff}
"""


def sample_topk_oracle(
    k: int, stratum_col: str = "lang", seed: str = "s1"
) -> str:
    return f"""
WITH keyed AS (
    SELECT doc_id, text, lang, source, n_chars,
           CAST({_sample_key_sql(seed)} AS BIGINT) AS sample_key
    FROM documents
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY {stratum_col} ORDER BY sample_key, doc_id
    ) AS INTEGER) AS rank
    FROM keyed
)
SELECT * FROM ranked WHERE rank <= {k}
"""


_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


def text_normalize_oracle() -> str:
    return f"""
WITH n AS (SELECT doc_id, text, {_NORM} AS norm_text FROM documents)
SELECT doc_id, norm_text, md5(norm_text) AS norm_md5,
       norm_text != text AS changed,
       CAST(CASE WHEN length(norm_text) = 0 THEN 0
            ELSE len(string_split(norm_text, ' ')) END AS BIGINT)
           AS norm_tokens
FROM n
"""


def dedup_clusters_oracle(threshold: float = 0.2) -> str:
    """Transitive closure of the minhash-LSH near-dup pair graph via
    recursive CTE; cluster label = min reachable doc_id (the exact
    fixpoint operators/dedup.dedup_clusters reaches by min-label
    propagation)."""
    return f"""
WITH RECURSIVE pairs AS (
    SELECT doc_a, doc_b FROM ({minhash_lsh_oracle(threshold)}) q
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(doc, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT reach.doc, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT doc AS doc_id,
       CAST(min(r) AS BIGINT) AS cluster_id,
       min(r) = doc AS is_canonical
FROM reach GROUP BY doc
"""


# --------------------------------------------------------------------------
# corpus assembly (operators/corpus.py)

def split_corpus_oracle(
    ratios: dict[str, float] | None = None, seed: str = "split1"
) -> str:
    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    key = hex32_sql(f"concat('{seed}', ':', CAST(doc_id AS STRING))")
    whens, acc = [], 0.0
    items = list(ratios.items())
    for name, r in items[:-1]:
        acc += r
        whens.append(f"WHEN split_key < {int(acc * (1 << 32))} THEN '{name}'")
    case = (
        "CASE " + " ".join(whens) + f" ELSE '{items[-1][0]}' END"
        if whens
        else f"'{items[-1][0]}'"
    )
    return f"""
WITH k AS (
    SELECT doc_id, CAST({key} AS BIGINT) AS split_key FROM documents
)
SELECT doc_id, split_key, {case} AS split FROM k
"""


def vocabulary_oracle(top_k: int = 100) -> str:
    return f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (
    SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
)
SELECT token, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER)
           AS rank
FROM c ORDER BY cnt DESC, token LIMIT {top_k}
"""


def contamination_oracle(
    benchmark_pred: str = "doc_id % 10 = 0",
    max_doc_freq: int | None = None,
) -> str:
    cap = (
        f"""
, dfreq AS (
    SELECT shingle FROM sh0 GROUP BY shingle
    HAVING count(*) <= {max_doc_freq}
),
shc AS (SELECT s.* FROM sh0 s JOIN dfreq USING (shingle))
"""
        if max_doc_freq is not None
        else ", shc AS (SELECT * FROM sh0)"
    )
    return f"""
WITH sh0 AS (
    SELECT doc_id, ({benchmark_pred}) AS is_bench,
           unnest({_SHINGLE_LIST}) AS shingle
    FROM documents
){cap},
train AS (SELECT doc_id, shingle FROM shc WHERE NOT is_bench),
bench AS (SELECT DISTINCT shingle FROM shc WHERE is_bench),
sizes AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
    FROM train GROUP BY doc_id
),
hits AS (
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
    FROM train t JOIN bench b USING (shingle) GROUP BY t.doc_id
)
SELECT s.doc_id, s.n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
           / CAST(s.n_shingles AS DOUBLE) AS contamination_ratio
FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
"""


def pack_sequences_oracle(
    seq_len: int = 512, n_shards: int = 8, seed: str = "pack1"
) -> str:
    """Recursive-CTE replay of the per-shard greedy fold: the walk
    carries (pack_id, offset) and steps through each shard's docs in
    doc_id order — the exact state machine of
    operators/corpus.pack_sequences' kernel."""
    key = hex32_sql(f"concat('{seed}', ':', CAST(doc_id AS STRING))")
    return f"""
WITH RECURSIVE d AS (
    SELECT doc_id,
           CAST(({key}) % {n_shards} AS INT) AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           row_number() OVER (
               PARTITION BY CAST(({key}) % {n_shards} AS INT)
               ORDER BY doc_id
           ) AS rn
    FROM documents
),
walk(shard, rn, doc_id, n_tokens, pack_id, offset_tokens) AS (
    SELECT shard, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
           CASE WHEN w.offset_tokens + w.n_tokens > 0
                 AND w.offset_tokens + w.n_tokens + d.n_tokens > {seq_len}
                THEN w.pack_id + 1 ELSE w.pack_id END,
           CASE WHEN w.offset_tokens + w.n_tokens > 0
                 AND w.offset_tokens + w.n_tokens + d.n_tokens > {seq_len}
                THEN CAST(0 AS BIGINT)
                ELSE w.offset_tokens + w.n_tokens END
    FROM walk w JOIN d ON d.shard = w.shard AND d.rn = w.rn + 1
)
SELECT doc_id, shard, pack_id, offset_tokens, n_tokens FROM walk
"""


def gopher_flags_oracle(
    min_words: int = 20,
    max_words: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> str:
    """Expected ``quality.gopher_flags``: identical integer-derived
    ratios and rule bounds (operators/quality.py)."""
    stop = _sql_list(STOPWORDS)
    return f"""
WITH t AS (
    SELECT doc_id, text,
           CAST(len({_TOKS}) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text)
                - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
           CAST((length(text)
                - length(replace(text, '...', ''))) / 3 AS BIGINT)
               AS n_ellipsis,
           CAST(len(list_filter({_TOKS},
               t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT)
               AS alpha_words,
           CAST(len(list_intersect({_TOKS}, {stop})) AS BIGINT)
               AS n_stop
    FROM documents
),
m AS (
    SELECT doc_id, n_words,
           CAST(n_chars - (n_words - 1) AS DOUBLE)
               / CAST(n_words AS DOUBLE) AS mean_word_len,
           CAST(n_hash + n_ellipsis AS DOUBLE)
               / CAST(n_words AS DOUBLE) AS symbol_ratio,
           CAST(alpha_words AS DOUBLE)
               / CAST(n_words AS DOUBLE) AS alpha_word_ratio,
           n_stop AS distinct_stopwords
    FROM t
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
       distinct_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words})
           AS flag_word_count,
       (mean_word_len >= {min_mean_word_len}
        AND mean_word_len <= {max_mean_word_len}) AS flag_mean_word_len,
       (symbol_ratio <= {max_symbol_ratio}) AS flag_symbol_ratio,
       (alpha_word_ratio >= {min_alpha_word_ratio}) AS flag_alpha_words,
       (distinct_stopwords >= {min_stopwords}) AS flag_stopwords,
       ((n_words >= {min_words} AND n_words <= {max_words})
        AND (mean_word_len >= {min_mean_word_len}
             AND mean_word_len <= {max_mean_word_len})
        AND (symbol_ratio <= {max_symbol_ratio})
        AND (alpha_word_ratio >= {min_alpha_word_ratio})
        AND (distinct_stopwords >= {min_stopwords})) AS keep
FROM m
"""


def _grams_list_sql(n: int) -> str:
    """Non-distinct word n-gram list (truncated-gram convention for
    docs shorter than n words) — mirrors quality._grams_sql."""
    return (
        f"[array_to_string(list_slice({_TOKS}, j + 1, j + {n}), ' ') "
        f"FOR j IN range(0, greatest(len({_TOKS}) - {n - 1}, 1))]"
    )


def gram_repetition_oracle() -> str:
    """Expected ``quality.gram_repetition``: per-(doc, gram) counts then
    per-doc totals, for n = 2 and 3."""
    return f"""
WITH g2 AS (
    SELECT doc_id, unnest({_grams_list_sql(2)}) AS gram FROM documents
),
c2 AS (
    SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2
),
s2 AS (
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_2gram,
           CAST(count(*) AS BIGINT) AS distinct_2gram,
           CAST(max(cnt) AS BIGINT) AS top_2gram_count
    FROM c2 GROUP BY doc_id
),
g3 AS (
    SELECT doc_id, unnest({_grams_list_sql(3)}) AS gram FROM documents
),
c3 AS (
    SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2
),
s3 AS (
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_3gram,
           CAST(count(*) AS BIGINT) AS distinct_3gram,
           CAST(max(cnt) AS BIGINT) AS top_3gram_count
    FROM c3 GROUP BY doc_id
)
SELECT s2.doc_id, total_2gram, top_2gram_count, total_3gram,
       distinct_3gram,
       CAST(top_2gram_count AS DOUBLE) / CAST(total_2gram AS DOUBLE)
           AS top_2gram_share,
       CAST(total_3gram - distinct_3gram AS DOUBLE)
           / CAST(total_3gram AS DOUBLE) AS dup_3gram_frac
FROM s2 JOIN s3 ON s2.doc_id = s3.doc_id
"""


def block_dedup_oracle(block_tokens: int = 16) -> str:
    """Expected ``quality.block_dedup_stats``: md5 per consecutive
    block, corpus-wide occurrence counts, per-doc duplicate fraction."""
    blocks = (
        f"[array_to_string(list_slice({_TOKS}, b * {block_tokens} + 1, "
        f"(b + 1) * {block_tokens}), ' ') "
        f"FOR b IN range(0, ((len({_TOKS}) - 1) // {block_tokens}) + 1)]"
    )
    return f"""
WITH b AS (
    SELECT doc_id, md5(unnest({blocks})) AS block_md5 FROM documents
),
corpus AS (
    SELECT block_md5, count(*) AS corpus_count FROM b GROUP BY block_md5
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN corpus_count > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_blocks,
       CAST(sum(CASE WHEN corpus_count > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dup_block_frac
FROM b JOIN corpus USING (block_md5)
GROUP BY doc_id
"""


def bm25_oracle(
    terms: list[str], k1: float = 1.2, b: float = 0.75
) -> str:
    """Expected ``retrieval.bm25_scores`` as projected by the gate:
    integer tf/df/dl, one double avgdl division, the per-term
    contribution in the textually identical operand order, and a
    0.0-seeded left fold over contributions in ascending term order.
    ln is transcendental and the JVM intrinsic can differ from libm by
    1 ULP (tests/test_retrieval.py pins the bound), so the final score
    is quantized to 1e-6 by exact integer floor in BOTH engines —
    identical results because the pre-quantization gap is ~1e-13."""
    from streamevmon_spark.operators.retrieval import quantize_micro_sql

    lit = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    kd = f"CAST({k1} AS DOUBLE)"
    bd = f"CAST({b} AS DOUBLE)"
    q = quantize_micro_sql("score")
    return f"""
SELECT doc_id, n_terms, dl, {q} AS score FROM (
WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
posting AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
    WHERE list_contains({lit}, term)
    GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(CAST(sum(len(toks)) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avgdl
    FROM toks
),
df_t AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM posting
    GROUP BY term
),
contrib AS (
    SELECT p.doc_id, p.term, dl.dl,
           ln(CAST(1.0 AS DOUBLE)
              + (CAST(s.n_docs - f.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(f.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * (CAST(p.tf AS DOUBLE)
              / (CAST(p.tf AS DOUBLE) + {kd} * (CAST(1.0 AS DOUBLE)
                 - {bd} + {bd} * (CAST(dl.dl AS DOUBLE) / s.avgdl))))
               AS contrib
    FROM posting p
    JOIN df_t f USING (term)
    JOIN dl USING (doc_id), stats s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       dl,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list(contrib ORDER BY term)),
           (x, y) -> x + y) AS score
FROM contrib
GROUP BY doc_id, dl
)
"""


def pii_scrub_oracle(augment_sql: str = "text") -> str:
    """Expected ``scrub.pii_scrub`` over ``augment_sql`` (a text
    expression over documents columns): the same rule chain in the
    same order; DuckDB's regexp_replace needs the 'g' flag to match
    Spark's replace-all semantics; counts via len(regexp_extract_all)
    on the text state each class actually saw."""
    from streamevmon_spark.operators.scrub import PII_RULES

    text_expr = augment_sql
    count_cols = []
    steps = [f"s0 AS (SELECT doc_id, {text_expr} AS t FROM documents)"]
    for i, (name, pat, repl) in enumerate(PII_RULES):
        prev, cur = f"s{i}", f"s{i + 1}"
        count_cols.append(f"n_{name}")
        steps.append(
            f"{cur} AS (SELECT doc_id, "
            f"regexp_replace(t, '{pat}', '{repl}', 'g') AS t, "
            + ", ".join(
                f"n_{PII_RULES[j][0]}" for j in range(i)
            )
            + (", " if i else "")
            + f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT)"
            f" AS n_{name} FROM {prev})"
        )
    last = f"s{len(PII_RULES)}"
    return (
        "WITH " + ",\n".join(steps)
        + f"\nSELECT doc_id, t AS scrubbed, "
        + ", ".join(count_cols)
        + f" FROM {last}"
    )


def unigram_logprob_oracle() -> str:
    """Expected ``textstats.unigram_logprob`` as projected by the
    gate: integer tf/ctf/total, the per-term contribution in the
    textually identical operand order, and the 0.0-seeded
    ascending-term fold divided by the token count — nll quantized to
    1e-6 (same ln-ULP rationale as :func:`bm25_oracle`)."""
    from streamevmon_spark.operators.retrieval import quantize_micro_sql

    q = quantize_micro_sql("nll")
    return f"""
SELECT doc_id, dl, {q} AS nll FROM (
WITH pairs AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents)
    GROUP BY doc_id, term
),
corpus AS (
    SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM pairs GROUP BY term
),
total AS (SELECT CAST(sum(ctf) AS BIGINT) AS t_total FROM corpus),
contrib AS (
    SELECT p.doc_id, p.term, p.tf,
           CAST(p.tf AS DOUBLE) * (-ln(CAST(c.ctf AS DOUBLE)
               / CAST(t.t_total AS DOUBLE))) AS contrib
    FROM pairs p JOIN corpus c USING (term), total t
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS dl,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list(contrib ORDER BY term)),
           (x, y) -> x + y)
           / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS nll
FROM contrib
GROUP BY doc_id
)
"""
