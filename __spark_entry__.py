"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG change-extraction pipeline on a
versioned-document corpus derived deterministically from sf0.001 and returns
the (subj, pred, obj, action) change-triple DataFrame.

``queries()`` exposes every implemented operator family from SURVEY.md §2:
the KG pipeline outputs (kg_*, rows-only — the grouped diff is not
SQL-expressible; their correctness gate is tests/test_diff_golden.py), the
relational operator suite (rel_*, exact DuckDB oracles), and the
training-data operators (text_*, dedup_*, ann_*; oracled where the math is
engine-portable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from widiff_spark import dedup, fixtures, relops, similarity, textops
from widiff_spark.pipeline import run_pipeline, triples

# one pipeline run per sf_dir, shared across kg_* queries (persisted)
_PIPELINE_CACHE: dict[str, object] = {}


_SHIPPED_SESSIONS: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``widiff_spark`` importable on Python workers regardless of the
    driver's cwd/sys.path — the session-level analog of
    ``spark-submit --py-files`` (north_rule deployment contract).  Without
    this, UDF closures unpickle only when workers happen to inherit a cwd
    containing the package."""
    if id(spark) in _SHIPPED_SESSIONS:
        return
    import os
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", f"widiff_spark_pyfiles_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            src = os.path.join(pkg_dir, "widiff_spark")
            for root, _dirs, files in os.walk(src):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, pkg_dir))
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Connect sessions without an SC; cwd-based import applies
    _SHIPPED_SESSIONS.add(id(spark))


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """The driver owns the session; set the runtime-settable conf the engine
    semantics depend on (UTC week/year buckets, Arrow batches, AQE)."""
    for k, v in (("spark.sql.session.timeZone", "UTC"),
                 ("spark.sql.execution.arrow.pyspark.enabled", "true"),
                 ("spark.sql.adaptive.enabled", "true")):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    _ship_package(spark)
    return spark


def _pipeline(spark: SparkSession, sf_dir: str):
    _ensure_conf(spark)
    if sf_dir not in _PIPELINE_CACHE:
        docs = fixtures.corpus_from_documents(spark, sf_dir)
        _PIPELINE_CACHE[sf_dir] = run_pipeline(spark, docs)
    return _PIPELINE_CACHE[sf_dir]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG change triples extracted from the sf0.001-derived
    versioned-document corpus."""
    res = _pipeline(spark, "/root/testdata/sf0.001")
    return triples(res.tables["value_change"])


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_conf(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _emb_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return e.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")


# ---------------------------------------------------------------------------
# KG pipeline queries (rows-only: grouped-map diff semantics, no SQL analog;
# the value-level oracle is the golden fixture suite in tests/)
# ---------------------------------------------------------------------------

def kg_triples(spark, sf_dir):
    return triples(_pipeline(spark, sf_dir).tables["value_change"]) \
        .orderBy("subj", "pred", "revision_id", "action")


def kg_value_change(spark, sf_dir):
    t = _pipeline(spark, sf_dir).tables["value_change"]
    return t.select("revision_id", "property_id", "value_id", "change_target",
                    "action", "old_value", "new_value", "is_reverted",
                    "reversion", "entity_id", "week", "year_month", "year",
                    "property_label", "label") \
            .orderBy("revision_id", "property_id", "value_id", "change_target")


def kg_revision(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["revision"] \
        .orderBy("revision_id")


def kg_entity_stats(spark, sf_dir):
    t = _pipeline(spark, sf_dir).tables["entity_stats"]
    return t.select("repo", "entity_id", "entity_label", "num_revisions",
                    "num_value_changes", "num_value_change_creates",
                    "num_value_change_deletes", "num_value_change_updates",
                    "num_rank_changes", "num_reverted_edits", "num_reversions",
                    "num_bot_edits", "num_human_edits", "cohort") \
            .orderBy("repo", "entity_id")


def kg_features_text(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["features_text"] \
        .orderBy("revision_id", "property_id", "value_id")


def kg_features_time(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["features_time"] \
        .orderBy("revision_id", "property_id", "value_id")


def kg_features_quantity(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["features_quantity"] \
        .orderBy("revision_id", "property_id", "value_id")


def kg_features_globecoordinate(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["features_globecoordinate"] \
        .orderBy("revision_id", "property_id", "value_id")


def kg_features_entity(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["features_entity"] \
        .orderBy("revision_id", "property_id", "value_id")


def kg_qualifier_change(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["qualifier_change"] \
        .orderBy("revision_id", "property_id", "value_id", "qual_property_id",
                 "value_hash")


def kg_reference_change(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["reference_change"] \
        .orderBy("revision_id", "property_id", "value_id", "ref_property_id",
                 "value_hash", "ref_hash")


def kg_datatype_metadata_change(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["datatype_metadata_change"] \
        .orderBy("revision_id", "property_id", "value_id", "change_target")


def kg_property_stats(spark, sf_dir):
    from widiff_spark import analysis
    return analysis.property_stats(
        _pipeline(spark, sf_dir).tables["value_change"]) \
        .orderBy("property_id")


def kg_cohort_rollup(spark, sf_dir):
    from widiff_spark import analysis
    return analysis.cohort_rollup(
        _pipeline(spark, sf_dir).tables["entity_stats"])


def kg_entity_type_stats(spark, sf_dir):
    from widiff_spark import analysis
    return analysis.entity_type_stats(
        _pipeline(spark, sf_dir).tables["entity_stats"]) \
        .orderBy("p31_type")


def kg_quarantine(spark, sf_dir):
    return _pipeline(spark, sf_dir).tables["quarantine"] \
        .orderBy("repo", "path", "commit")


# ---------------------------------------------------------------------------
# training-data operators over documents/embeddings
# ---------------------------------------------------------------------------

def text_token_count(spark, sf_dir):
    return textops.token_count(_docs(spark, sf_dir)).orderBy("doc_id") \
        .withColumn("n_tokens", F.col("n_tokens").cast("int"))


def text_quality(spark, sf_dir):
    return textops.quality_score(_docs(spark, sf_dir)).orderBy("doc_id") \
        .withColumn("n_tokens", F.col("n_tokens").cast("int"))


def text_language_id(spark, sf_dir):
    return textops.language_id(_docs(spark, sf_dir)).orderBy("doc_id") \
        .withColumn("lang_hits", F.col("lang_hits").cast("long"))


def text_fingerprint(spark, sf_dir):
    return textops.fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")


def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir)) \
        .orderBy("fingerprint")


def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard, candidate-bounded by rare shingles (df <= 100):
    the unrestricted shared-shingle self-join is quadratic on any hot
    shingle at corpus scale."""
    sh = dedup.shingles(_docs(spark, sf_dir))
    cands = dedup.rare_shingle_candidates(sh, max_df=100)
    return dedup.jaccard_pairs(sh, min_jaccard=0.8, candidates=cands) \
        .orderBy("doc_a", "doc_b")


def dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_near_duplicates(_docs(spark, sf_dir),
                                         min_jaccard=0.5) \
        .orderBy("doc_a", "doc_b")


def dedup_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir)).orderBy("doc_id")


def dedup_embedding_cosine(spark, sf_dir):
    """LSH-bucketed embedding near-dup: sketch equi-join candidates, exact
    cosine verify inside buckets (the all-pairs cartesian does not survive
    corpus scale; the oracle applies the identical sketch restriction)."""
    return similarity.bucketed_pairwise_cosine(
        _emb(spark, sf_dir), min_cosine=0.4, dim=64, n_planes=4) \
        .orderBy("vec_a", "vec_b")


def ann_knn_bruteforce(spark, sf_dir):
    return similarity.knn_bruteforce(_emb(spark, sf_dir),
                                     _emb_queries(spark, sf_dir), k=5) \
        .orderBy("query_id", "rank")


def ann_knn_lsh(spark, sf_dir):
    return similarity.knn_lsh(_emb(spark, sf_dir),
                              _emb_queries(spark, sf_dir), dim=64, k=5,
                              n_planes=4) \
        .orderBy("query_id", "rank")


def ann_knn_ivf(spark, sf_dir):
    return similarity.knn_ivf(_emb(spark, sf_dir),
                              _emb_queries(spark, sf_dir), k=5) \
        .orderBy("query_id", "rank")


def mm_media_features(spark, sf_dir):
    from widiff_spark import multimodal
    media = multimodal.synthesize_media(_docs(spark, sf_dir))
    return (multimodal.extract_features(media)
            .select("doc_id", "media_type", "n_bytes",
                    F.round(F.element_at("feature", 1), 4).alias("f0"))
            .orderBy("doc_id"))


def mm_resize_plan(spark, sf_dir):
    from widiff_spark import multimodal
    media = multimodal.synthesize_media(_docs(spark, sf_dir))
    return multimodal.resize_images(media).orderBy("doc_id")


def mm_frame_sample(spark, sf_dir):
    from widiff_spark import multimodal
    media = multimodal.synthesize_media(_docs(spark, sf_dir))
    return multimodal.sample_frames(media).orderBy("doc_id", "frame_ts_ms")


def dedup_simhash_pairs(spark, sf_dir):
    return dedup.simhash_near_duplicates(_docs(spark, sf_dir),
                                         max_hamming=1) \
        .orderBy("doc_a", "doc_b")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {
        # KG pipeline (SURVEY §2.1-§2.10 core: S4, J3-J6, W1-W4, A1-A3, F1-F7)
        "kg_triples": kg_triples,
        "kg_value_change": kg_value_change,
        "kg_revision": kg_revision,
        "kg_entity_stats": kg_entity_stats,
        "kg_features_text": kg_features_text,
        "kg_features_time": kg_features_time,
        "kg_features_quantity": kg_features_quantity,
        "kg_features_globecoordinate": kg_features_globecoordinate,
        "kg_features_entity": kg_features_entity,
        "kg_qualifier_change": kg_qualifier_change,
        "kg_reference_change": kg_reference_change,
        "kg_datatype_metadata_change": kg_datatype_metadata_change,
        # training-data ops
        "text_token_count": text_token_count,
        "text_quality": text_quality,
        "text_language_id": text_language_id,
        "text_fingerprint": text_fingerprint,
        "dedup_exact": dedup_exact,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_simhash": dedup_simhash,
        "dedup_simhash_pairs": dedup_simhash_pairs,
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "ann_knn_bruteforce": ann_knn_bruteforce,
        "ann_knn_lsh": ann_knn_lsh,
        "ann_knn_ivf": ann_knn_ivf,
        "mm_media_features": mm_media_features,
        "mm_resize_plan": mm_resize_plan,
        "mm_frame_sample": mm_frame_sample,
        "kg_property_stats": kg_property_stats,
        "kg_cohort_rollup": kg_cohort_rollup,
        "kg_entity_type_stats": kg_entity_type_stats,
        "kg_quarantine": kg_quarantine,
    }
    out.update(relops.QUERIES)
    return out


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = "string_split_regex(trim(text), '\\s+')"
_STOPLIST = ", ".join(
    f"'{w}'" for w in sorted(set(w for ws in textops.STOPWORDS.values()
                                 for w in ws)))
_STOPVALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in sorted(textops.STOPWORDS.items())
    for w in ws)

_SHINGLES = """
    WITH t AS (
      SELECT doc_id, string_split({norm}, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[s:least(s + 2, len(toks))], ' ') AS shingle
      FROM t, unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(s))
""".format(norm=_NORM)

def _sketch_sql(emb_expr: str, n_planes: int, dim: int = 64) -> str:
    """The sign-bit LSH sketch as DuckDB SQL with the deterministic sha256
    hyperplanes (similarity._hyperplane) inlined as constants — the oracle
    recomputes the bucketing independently of Spark."""
    from widiff_spark.similarity import _hyperplane
    terms = []
    for p in range(n_planes):
        plane = "[" + ", ".join(repr(v) for v in _hyperplane(dim, p)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({emb_expr} AS DOUBLE[]), "
            f"{plane}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_MINHASH_SIG = _SHINGLES + """
    , sig AS (
      SELECT doc_id,
             """ + ",\n             ".join(
    f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(8)) + """
      FROM sh GROUP BY doc_id)
"""


def oracle_sql() -> dict[str, str]:
    out = dict(relops.ORACLE_SQL)

    out["text_token_count"] = f"""
        SELECT doc_id, CAST(len({_TOKS}) AS INT) AS n_tokens,
               CAST(length(text) AS INT) AS n_chars_actual,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
        FROM documents ORDER BY doc_id
    """
    out["text_quality"] = f"""
        WITH base AS (
          SELECT doc_id,
                 len({_TOKS}) AS n_tokens,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                   AS punct,
                 len(list_filter({_TOKS}, x -> x IN ({_STOPLIST}))) AS stop_hits
          FROM documents)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               round(punct / greatest(n_chars, 1), 4) AS punct_ratio,
               round(stop_hits / greatest(n_tokens, 1), 4) AS stopword_ratio,
               round((n_chars - (n_tokens - 1)) / greatest(n_tokens, 1), 4)
                 AS mean_word_len,
               round((CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 0.4 ELSE 0.0 END)
                     + (CASE WHEN round(punct / greatest(n_chars, 1), 4) < 0.1
                             THEN 0.3 ELSE 0.0 END)
                     + least(round(stop_hits / greatest(n_tokens, 1), 4) * 2, 0.3),
                     4) AS quality
        FROM base ORDER BY doc_id
    """
    out["text_language_id"] = f"""
        WITH words AS (
          SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+'))
            AS word FROM documents),
        dim(cand_lang, word) AS (VALUES {_STOPVALUES}),
        hits AS (
          SELECT doc_id, cand_lang, count(*) AS hits
          FROM words JOIN dim USING (word) GROUP BY 1, 2),
        best AS (
          SELECT doc_id, cand_lang, hits,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, cand_lang ASC) AS rn
          FROM hits)
        SELECT d.doc_id,
               coalesce(b.cand_lang, 'und') AS lang_pred,
               CAST(coalesce(b.hits, 0) AS BIGINT) AS lang_hits
        FROM documents d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
        ORDER BY d.doc_id
    """
    out["text_fingerprint"] = f"""
        SELECT doc_id, md5({_NORM}) AS fingerprint
        FROM documents ORDER BY doc_id
    """
    out["dedup_exact"] = f"""
        SELECT md5({_NORM}) AS fingerprint,
               min(doc_id) AS canonical_doc_id, count(*) AS n_docs
        FROM documents GROUP BY 1 ORDER BY fingerprint
    """
    out["dedup_ngram_jaccard"] = _SHINGLES + """
        , rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM (SELECT * FROM sh WHERE shingle IN (SELECT shingle FROM rare)) a
          JOIN (SELECT * FROM sh WHERE shingle IN (SELECT shingle FROM rare)) b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b, i.n_common,
               round(i.n_common / (sa.n + sb.n - i.n_common), 4) AS jaccard
        FROM inter i
        JOIN cands c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE round(i.n_common / (sa.n + sb.n - i.n_common), 4) >= 0.8
        ORDER BY i.doc_a, i.doc_b
    """
    bands = []
    for b in range(4):
        cols = " || '|' || ".join(f"mh{b * 2 + r}" for r in range(2))
        bands.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS key FROM sig")
    out["dedup_minhash_lsh"] = _MINHASH_SIG + f"""
        , buckets AS ({' UNION ALL '.join(bands)}),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM buckets a JOIN buckets b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        verified AS (
          SELECT i.doc_a, i.doc_b, i.n_common,
                 round(i.n_common / (sa.n + sb.n - i.n_common), 4) AS jaccard
          FROM inter i
          JOIN cands c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b)
        SELECT * FROM verified WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b
    """
    bit_sums = ",\n               ".join(
        f"sum(ascii(substring(h, {j + 1}, 1)) % 2 * 2 - 1) AS s{j}"
        for j in range(16))
    bit_value = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))
    out["dedup_simhash"] = f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
          FROM documents),
        h AS (SELECT doc_id, md5(tok) AS h FROM toks),
        bits AS (
          SELECT doc_id,
               {bit_sums}
          FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({bit_value} AS BIGINT) AS simhash
        FROM bits ORDER BY doc_id
    """
    out["dedup_embedding_cosine"] = f"""
        WITH sk AS (
          SELECT vec_id, embedding,
                 {_sketch_sql('embedding', n_planes=4)} AS sketch
          FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(
                 CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM sk a JOIN sk b
          ON a.sketch = b.sketch AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
        ORDER BY vec_a, vec_b
    """
    out["ann_knn_bruteforce"] = """
        WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                   WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 4) AS cosine
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.query_id),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, vec_id ASC)
                      AS INT) AS rank
          FROM scored)
        SELECT * FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """
    _MEDIA = """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               CAST(doc_id % 640 + 16 AS INT) AS width,
               CAST(doc_id % 480 + 16 AS INT) AS height,
               CAST(doc_id * 40 % 60000 AS INT) AS duration_ms
        FROM documents
    """
    out["mm_resize_plan"] = f"""
        WITH media AS ({_MEDIA})
        SELECT doc_id, width, height,
               round(least(1.0, 256 / greatest(width, height)), 4) AS scale,
               CAST(floor(width * least(1.0, 256 / greatest(width, height)))
                    AS INT) AS target_width,
               CAST(floor(height * least(1.0, 256 / greatest(width, height)))
                    AS INT) AS target_height
        FROM media WHERE media_type LIKE 'image/%' ORDER BY doc_id
    """
    out["mm_frame_sample"] = f"""
        WITH media AS ({_MEDIA})
        SELECT doc_id,
               CAST(unnest(generate_series(0, duration_ms, 1000)) AS INT)
                 AS frame_ts_ms
        FROM media WHERE media_type LIKE 'video/%'
        ORDER BY doc_id, frame_ts_ms
    """
    out["dedup_simhash_pairs"] = f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
          FROM documents),
        h AS (SELECT doc_id, md5(tok) AS h FROM toks),
        bits AS (
          SELECT doc_id,
               {bit_sums}
          FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({bit_value} AS BIGINT) AS simhash
                FROM bits)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
        ORDER BY doc_a, doc_b
    """
    out["ann_knn_lsh"] = f"""
        WITH corpus AS (
          SELECT vec_id, embedding,
                 {_sketch_sql('embedding', n_planes=4)} AS sketch
          FROM embeddings),
        q0 AS (
          SELECT vec_id AS query_id, embedding AS q_emb,
                 {_sketch_sql('embedding', n_planes=4)} AS sketch
          FROM embeddings WHERE vec_id < 5),
        q AS (  -- radius-1 multi-probe: own bucket + one-bit-flip buckets
          SELECT query_id, q_emb,
                 unnest([sketch, xor(sketch, 1), xor(sketch, 2),
                         xor(sketch, 4), xor(sketch, 8)]) AS sketch
          FROM q0),
        scored AS (
          SELECT DISTINCT q.query_id, c.vec_id,
                 round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.q_emb AS DOUBLE[])), 4) AS cosine
          FROM corpus c JOIN q ON c.sketch = q.sketch
          WHERE c.vec_id <> q.query_id),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, vec_id ASC)
                      AS INT) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank FROM ranked
        WHERE rank <= 5 ORDER BY query_id, rank
    """
    out["ann_knn_ivf"] = """
        WITH cent AS (
          SELECT vec_id AS cell_id, embedding AS c_emb
          FROM embeddings ORDER BY vec_id LIMIT 16),
        corpus_sc AS (
          SELECT e.vec_id, e.embedding, c.cell_id,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(c.c_emb AS DOUBLE[])) AS c_cos
          FROM embeddings e CROSS JOIN cent c),
        corpus AS (
          SELECT vec_id, embedding, cell_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, cell_id ASC) AS r
            FROM corpus_sc) WHERE r = 1),
        probe_sc AS (
          SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cell_id,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(c.c_emb AS DOUBLE[])) AS c_cos
          FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 5),
        probes AS (
          SELECT query_id, q_emb, cell_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY c_cos DESC, cell_id ASC) AS r
            FROM probe_sc) WHERE r <= 4),
        scored AS (
          SELECT p.query_id, c.vec_id,
                 round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(p.q_emb AS DOUBLE[])), 4) AS cosine
          FROM corpus c JOIN probes p ON c.cell_id = p.cell_id
          WHERE c.vec_id <> p.query_id),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, vec_id ASC)
                      AS INT) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank FROM ranked
        WHERE rank <= 5 ORDER BY query_id, rank
    """
    # the fake-decoder seam is deterministic sha256 byte statistics — the
    # oracle recomputes f0 = (digest[0] - 127.5) / 128 from the hex digest
    _B0 = ("((instr('0123456789abcdef', substr(sha256(text), 1, 1)) - 1) * 16"
           " + (instr('0123456789abcdef', substr(sha256(text), 2, 1)) - 1))")
    out["mm_media_features"] = f"""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               round(({_B0} - 127.5) / 128.0, 4) AS f0
        FROM documents ORDER BY doc_id
    """
    # kg_* queries: the oracle is the pure-pandas reference pipeline
    # (widiff_spark/golden.py) materialized as parquet by
    # scripts/make_golden.py — shared per-row kernels (PageDiffer/digest,
    # pinned by tests/test_diff_golden.py against the reference semantics),
    # fully independent orchestration (no Spark, no bucketing, no Arrow, no
    # joins).  DuckDB reads the golden parquet directly.
    import os
    gdir = os.environ.get("WIDIFF_GOLDEN_DIR", "/root/repo/golden/sf0.01")
    for q in ("kg_triples", "kg_value_change", "kg_revision",
              "kg_qualifier_change", "kg_reference_change",
              "kg_datatype_metadata_change", "kg_entity_stats",
              "kg_features_text", "kg_features_time", "kg_features_quantity",
              "kg_features_globecoordinate", "kg_features_entity",
              "kg_quarantine", "kg_property_stats", "kg_cohort_rollup",
              "kg_entity_type_stats"):
        out[q] = f"SELECT * FROM read_parquet('{gdir}/{q}.parquet')"
    return out
