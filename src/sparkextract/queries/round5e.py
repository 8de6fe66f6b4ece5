"""Round-5 continuation wave 3: the remaining classic pipeline shapes —
true edit-distance dedup verification, span interval merging, filter
disparity auditing, and crawl-frontier URL canonicalization.

q146 — EDIT-DISTANCE NEAR-DUP VERIFICATION (blocked). Every near-dup
method in this repo so far scores candidates with a set metric
(Jaccard q20/q139, cosine q34/q53, Hamming q68, containment q124);
the classic record-linkage verifier is TRUE EDIT DISTANCE
(Levenshtein), the metric behind fuzzy URL/title matching and the
"verify" stage of suffix-array dedup follow-ups. All-pairs Levenshtein
is doubly impossible at corpus scale (O(N^2) pairs x O(L^2) per pair),
so the standard shape is: (1) BLOCK on an exact mid-string slice
(chars 17..40 — deterministically unchanged by the injected head
edits, and a 24-char exact key so collisions are near-dups or hash
luck, never boilerplate); (2) df-cap the blocks (2..16 docs — the same
hot-key exclusion as q139's rare-shingle cap); (3) verify each
co-blocked pair with Levenshtein over a 256-char PREFIX CAP (edit
distance is O(L_a * L_b) per pair — production verifiers always cap
the comparison window; Spark's `levenshtein` and DuckDB's are both the
unit-cost Wagner-Fischer distance and agree exactly, parity-tested in
tests/test_round5e.py). Near-dup pairs are injected (every 9th doc
re-appears with its first 3 chars rewritten), so edit_dist <= 3 pairs
must exist at every SF.
Reference intent: the duplicate-table similarity check of
/root/reference/src/table_evaluator.py (cell-level table similarity)
re-expressed with the string-metric verifier the record-linkage
literature uses.
Scale shape: the keyed table is built once per (session, input) via
checkpoint_memo (self-join reads it twice); the block join is a keyed
equi-join whose per-key fan-out the df cap bounds at C(16,2); the
Levenshtein runs only on co-blocked pairs. sim_u = round((1 -
d/max_len) * 1e6) follows the established micro-unit snap recipe.

q147 — SPAN INTERVAL MERGE (gaps-and-islands). Every span-emitting
stage (PII regex hits q97, secret-scan matches q141, OCR span
boundaries) produces OVERLAPPING intervals that must be coalesced
before the replacement/redaction is applied — the classic
gaps-and-islands problem. Spans here are the deterministic keyword
hits ('table'/'row'/'key') widened to [pos, pos+2] token-unit
intervals; merging is the textbook two-window form: an interval opens
a new island iff its start exceeds the running MAX(end) of all prior
intervals in the doc (strict overlap-or-touch merge: s <= prev_max_e
merges, s = prev_max_e + 1 does not), island ids are the running sum
of the new-island flag, and the per-doc report is (n_spans, n_islands,
covered_tokens, max_island_len) — all exact integers.
Scale shape: the only shuffle key is doc_id; both windows and both
groupBys share that partitioning (a doc's spans are bounded by its
token count, so no per-key skew beyond the documented mega-doc path
q42 already handles). Reference intent: the span-offset bookkeeping of
/root/reference/src/text_processor.py:38-87 (ordered span assembly)
extended with the overlap-coalescing every redaction pipeline needs.

q148 — FILTER DISPARITY AUDIT (Gini over per-source keep rates). A
corpus-wide quality gate that silently drops one source or language
harder than the rest is a curation bug (the Gopher/Dolma reports audit
exactly this); the standard scalar is the GINI COEFFICIENT of the
per-group keep rates, plus the max-min range. The keep gate is the
q135 linear classifier (same frozen weights); per-source (n, k) is ONE
map-side-combinable groupBy; everything after — pairwise |r_i - r_j|,
the Gini ratio — runs on the <= #sources row grain (20 at every SF;
the documented tiny-grain exception, cf. q137's 81-bin cumulative).
Numeric discipline: rates are micro-unit BIGINTs; the pairwise
absolute-difference sum is exact integer arithmetic (bounded by
n_src^2 * 1e6 << 2^53); Gini = sumabs / (2 * n_src * sum_rates) is ONE
IEEE division snapped to micro-units.

q149 — URL CANONICALIZATION DEDUP (crawl-frontier normalization). The
first dedup any web pipeline runs is not on content but on the URL:
scheme/host case-folding, www-prefix and default-port stripping,
tracking-query and fragment removal, trailing-slash normalization —
so the frontier never fetches the same resource six ways. Six
deterministic messy variants per canonical target are synthesized
(plain / upper-cased scheme+www+host / utm query / trailing slash /
fragment / explicit :443), the canonical chain is applied with
dialect-portable regexes (the q97 regex-subset discipline), and the
rollup reports per canonical URL the variant count, distinct raw-form
count and the minimum doc_id (the frontier's survivor pick).
Scale shape: the canonical chain is map-only string work inside
whole-stage codegen; the only shuffle is the final groupBy(canonical).
Reference intent: /root/reference/src/database_manager.py's
content-hash dedup key, applied at the URL grain a crawler needs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkextract.queries.base import checkpoint_memo, load, register
from sparkextract.queries.round5d import _Q135_CORE_SQL, _q135_features

# --------------------------------------------------------------------------
# q146: blocked edit-distance near-dup verification

_Q146_EVERY = 9          # every 9th doc gets an injected near-dup copy
_Q146_ID_OFFSET = 3000000
_Q146_BLOCK_OFF = 17     # block key: exact slice chars 17..40 (1-based)
_Q146_BLOCK_LEN = 24
_Q146_DF_MIN, _Q146_DF_MAX = 2, 16   # block df cap (hot-key exclusion)
_Q146_PREFIX = 256       # Levenshtein prefix cap
_Q146_MAX_DIST = 24      # verification threshold

_Q146_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_Q146_ID_OFFSET} AS doc_id,
         'zqx' || SUBSTRING(text, 4) AS text
  FROM documents WHERE doc_id % {_Q146_EVERY} = 0
), keyed AS (
  SELECT doc_id,
         SUBSTRING(text, {_Q146_BLOCK_OFF}, {_Q146_BLOCK_LEN}) AS bkey,
         SUBSTRING(text, 1, {_Q146_PREFIX}) AS p
  FROM corpus
  WHERE LENGTH(text) >= {_Q146_BLOCK_OFF + _Q146_BLOCK_LEN - 1}
), ok AS (
  SELECT bkey FROM keyed GROUP BY bkey
  HAVING COUNT(*) BETWEEN {_Q146_DF_MIN} AND {_Q146_DF_MAX}
), pairs AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
         levenshtein(a.p, b.p) AS d,
         GREATEST(LENGTH(a.p), LENGTH(b.p)) AS maxlen
  FROM keyed a
  JOIN ok ON ok.bkey = a.bkey
  JOIN keyed b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT CAST(left_id AS BIGINT) AS left_id,
       CAST(right_id AS BIGINT) AS right_id,
       CAST(d AS BIGINT) AS edit_dist,
       CAST(ROUND((1.0 - CAST(d AS DOUBLE) / maxlen) * 1000000.0)
            AS BIGINT) AS sim_u
FROM pairs WHERE d <= {_Q146_MAX_DIST}
"""


@register("q146_edit_distance_near_dup", oracle=_Q146_ORACLE)
def q146_edit_distance_near_dup(spark, sf_dir):
    def _build_keyed():
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        near = docs.filter(F.col("doc_id") % _Q146_EVERY == 0).select(
            (F.col("doc_id") + _Q146_ID_OFFSET).alias("doc_id"),
            F.concat(F.lit("zqx"), F.expr("substring(text, 4)")).alias("text"),
        )
        corpus = docs.unionByName(near).filter(
            F.length("text") >= _Q146_BLOCK_OFF + _Q146_BLOCK_LEN - 1
        )
        return corpus.select(
            "doc_id",
            F.substring("text", _Q146_BLOCK_OFF, _Q146_BLOCK_LEN).alias("bkey"),
            F.substring("text", 1, _Q146_PREFIX).alias("p"),
        )

    keyed = checkpoint_memo(spark, sf_dir, "q146_keyed", _build_keyed)
    ok = (
        keyed.groupBy("bkey")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df").between(_Q146_DF_MIN, _Q146_DF_MAX))
        .select("bkey")
    )
    a = keyed.join(ok, "bkey").select(
        "bkey", F.col("doc_id").alias("left_id"), F.col("p").alias("pa")
    )
    b = keyed.select(
        "bkey", F.col("doc_id").alias("right_id"), F.col("p").alias("pb")
    )
    d = F.levenshtein("pa", "pb")
    maxlen = F.greatest(F.length("pa"), F.length("pb"))
    return (
        a.join(b, "bkey")
        .filter(F.col("left_id") < F.col("right_id"))
        .filter(d <= _Q146_MAX_DIST)
        .select(
            "left_id",
            "right_id",
            d.cast("long").alias("edit_dist"),
            F.round(
                (F.lit(1.0) - d.cast("double") / maxlen) * F.lit(1000000.0)
            )
            .cast("long")
            .alias("sim_u"),
        )
    )


# --------------------------------------------------------------------------
# q147: span interval merge (gaps-and-islands)

_Q147_KW = ("table", "row", "key")
_Q147_WIDTH = 2  # interval = [pos, pos + width] in token units

_Q147_KW_SQL = ", ".join(f"'{k}'" for k in _Q147_KW)

_Q147_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos1
  FROM documents
), spans AS (
  SELECT doc_id, pos1 - 1 AS s, pos1 - 1 + {_Q147_WIDTH} AS e
  FROM toks WHERE tok IN ({_Q147_KW_SQL})
), flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM spans
), islands AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY doc_id ORDER BY s
           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), merged AS (
  SELECT doc_id, island, MIN(s) AS ms, MAX(e) AS me
  FROM islands GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_islands,
         CAST(SUM(me - ms + 1) AS BIGINT) AS covered_tokens,
         CAST(MAX(me - ms + 1) AS BIGINT) AS max_island_len
  FROM merged GROUP BY doc_id
), counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM spans
  GROUP BY doc_id
)
SELECT p.doc_id, c.n_spans, p.n_islands, p.covered_tokens, p.max_island_len
FROM per_doc p JOIN counts c USING (doc_id)
"""


@register("q147_span_interval_merge", oracle=_Q147_ORACLE)
def q147_span_interval_merge(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    kw = F.col("tok") == F.lit(_Q147_KW[0])
    for k in _Q147_KW[1:]:
        kw = kw | (F.col("tok") == F.lit(k))
    spans = toks.filter(kw).select(
        "doc_id",
        F.col("pos").cast("long").alias("s"),
        (F.col("pos") + _Q147_WIDTH).cast("long").alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "new_island",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("doc_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.col("me") - F.col("ms") + 1).cast("long").alias("covered_tokens"),
        F.max(F.col("me") - F.col("ms") + 1).cast("long").alias("max_island_len"),
    )
    counts = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans")
    )
    return per_doc.join(counts, "doc_id").select(
        "doc_id", "n_spans", "n_islands", "covered_tokens", "max_island_len"
    )


# --------------------------------------------------------------------------
# q148: filter disparity audit (Gini over per-source keep rates)

_Q148_ORACLE = f"""
WITH core AS (
  SELECT d.source, (c.logit_u >= 0) AS keep
  FROM ({_Q135_CORE_SQL}) c JOIN documents d USING (doc_id)
), per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000.0
                    / COUNT(*)) AS BIGINT) AS keep_rate_u
  FROM core GROUP BY source
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_src,
         CAST(SUM(keep_rate_u) AS BIGINT) AS sum_r,
         CAST(MAX(keep_rate_u) - MIN(keep_rate_u) AS BIGINT) AS range_u
  FROM per_src
), sumabs AS (
  SELECT CAST(SUM(ABS(a.keep_rate_u - b.keep_rate_u)) AS BIGINT) AS sumabs
  FROM per_src a, per_src b
), gini AS (
  SELECT CAST(ROUND(sumabs * 1000000.0 / (2.0 * n_src * sum_r)) AS BIGINT)
           AS gini_u,
         range_u
  FROM sumabs, stats
)
SELECT p.source, p.n_docs, p.n_keep, p.keep_rate_u, g.gini_u, g.range_u
FROM per_src p, gini g
"""


@register("q148_filter_disparity", oracle=_Q148_ORACLE)
def q148_filter_disparity(spark, sf_dir):
    feats = _q135_features(spark, sf_dir).select(
        "doc_id", (F.col("logit_u") >= 0).alias("keep")
    )
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = (
        feats.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
        )
        .withColumn(
            "keep_rate_u",
            F.round(F.col("n_keep") * F.lit(1000000.0) / F.col("n_docs"))
            .cast("long"),
        )
    )
    # tiny grain from here (<= #sources rows): pairwise |diff| + the
    # Gini ratio on a crossJoin of the aggregated frame with itself
    a = per_src.select(F.col("keep_rate_u").alias("ra"))
    b = per_src.select(F.col("keep_rate_u").alias("rb"))
    sumabs = a.crossJoin(b).agg(
        F.sum(F.abs(F.col("ra") - F.col("rb"))).cast("long").alias("sumabs")
    )
    stats = per_src.agg(
        F.count("*").cast("long").alias("n_src"),
        F.sum("keep_rate_u").cast("long").alias("sum_r"),
        (F.max("keep_rate_u") - F.min("keep_rate_u"))
        .cast("long")
        .alias("range_u"),
    )
    gini = sumabs.crossJoin(stats).select(
        F.round(
            F.col("sumabs")
            * F.lit(1000000.0)
            / (F.lit(2.0) * F.col("n_src") * F.col("sum_r"))
        )
        .cast("long")
        .alias("gini_u"),
        "range_u",
    )
    return per_src.crossJoin(F.broadcast(gini))


# --------------------------------------------------------------------------
# q149: URL canonicalization dedup

_Q149_GROUP = 6      # docs per canonical target (one per mess variant)
_Q149_HOSTS = 23

_Q149_ORACLE = f"""
WITH raw AS (
  SELECT doc_id,
         'site' || CAST((doc_id // {_Q149_GROUP}) % {_Q149_HOSTS} AS VARCHAR)
           || '.example.com' AS host,
         '/p/' || CAST(doc_id // {_Q149_GROUP} AS VARCHAR) AS path,
         doc_id % {_Q149_GROUP} AS variant
  FROM documents
), urls AS (
  SELECT doc_id,
         CASE variant
           WHEN 0 THEN 'https://' || host || path
           WHEN 1 THEN 'HTTPS://WWW.' || UPPER(host) || path
           WHEN 2 THEN 'https://' || host || path
                       || '?utm_source=feed&utm_medium=rss'
           WHEN 3 THEN 'https://' || host || path || '/'
           WHEN 4 THEN 'https://' || host || path || '#section-2'
           ELSE 'https://' || host || ':443' || path
         END AS url
  FROM raw
), canon AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               LOWER(regexp_replace(regexp_replace(url, '#.*$', ''),
                                    '\\?.*$', '')),
               '://www\\.', '://'),
             ':443/', '/'),
           '/$', '') AS canonical_url
  FROM urls
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM canon GROUP BY canonical_url
"""


@register("q149_url_canonicalize", oracle=_Q149_ORACLE)
def q149_url_canonicalize(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    g = F.expr(f"doc_id div {_Q149_GROUP}")
    host = F.concat(
        F.lit("site"),
        (g % _Q149_HOSTS).cast("string"),
        F.lit(".example.com"),
    )
    path = F.concat(F.lit("/p/"), g.cast("string"))
    variant = F.col("doc_id") % _Q149_GROUP
    base = F.concat(F.lit("https://"), host, path)
    url = (
        F.when(variant == 1, F.concat(F.lit("HTTPS://WWW."), F.upper(host), path))
        .when(variant == 2, F.concat(base, F.lit("?utm_source=feed&utm_medium=rss")))
        .when(variant == 3, F.concat(base, F.lit("/")))
        .when(variant == 4, F.concat(base, F.lit("#section-2")))
        .when(variant == 5, F.concat(F.lit("https://"), host, F.lit(":443"), path))
        .otherwise(base)
    )
    # canonical chain, dialect-portable regex subset (q97 discipline):
    # fragment -> query -> case-fold -> www. -> default port -> trailing /
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(
                    F.regexp_replace(
                        F.regexp_replace(url, r"#.*$", ""), r"\?.*$", ""
                    )
                ),
                r"://www\.",
                "://",
            ),
            r":443/",
            "/",
        ),
        r"/$",
        "",
    )
    return (
        docs.select(
            "doc_id", url.alias("url"), canonical.alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("url").cast("long").alias("n_raw_forms"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )
