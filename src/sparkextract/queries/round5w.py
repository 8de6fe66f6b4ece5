"""Round-5 continuation wave 21: privacy-preserving release and
resampling uncertainty — the two statistical disciplines a corpus
TEAM needs around the numbers the other 180 queries produce.

q190 — DIFFERENTIAL-PRIVACY NOISY COUNT RELEASE + UTILITY AUDIT
(Dwork et al. 2006). Per-source document counts released under the
Laplace mechanism (sensitivity 1, epsilon 1 -> scale b = 1), with the
utility audit a data steward runs before shipping the release: L1
error per cell and rank agreement between the true and noisy top-N.
Noise is md5-DERIVED pseudo-randomness (the repo's oracle discipline —
never engine rand()): u = (k + 0.5)/1e6 from the first 8 md5 hex
digits of the salted source, inverse-CDF'd through the Laplace
quantile -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|). The +0.5 offset
keeps u strictly inside (0,1) so the ln argument is never 0. All
doubles are ROUND(,6)-frozen; ranks are computed on the FROZEN noisy
value with the source string as tie-break, so both engines rank the
identical surface.
Reference intent: the reference stores extraction stats per database
(/root/reference/src/pdf_extraction/database_manager.py stats); this
is the privacy-correct way to publish them.

Scale shape: one mergeable count per source, then windows over the
|sources| rollup (tiny). Zero corpus-sized joins or windows.

q191 — POISSON-BOOTSTRAP CONFIDENCE INTERVAL (Chamandy et al. 2012,
"Estimating uncertainty for massive data streams" — the Google
bootstrap for exactly this setting). The classic bootstrap resamples
n rows WITH replacement — impossible distributed; the Poisson
bootstrap replaces each row's multinomial count with an independent
Poisson(1) weight, turning resampling into a MAP-SIDE weight column:
32 replicates of the mean-n_chars statistic computed in ONE pass as
sum(w*x)/sum(w) per replicate, w drawn by inverse-CDF lookup of a
Poisson(1) table against md5(doc_id, r) micro-uniforms (integer
thresholds precomputed driver-side; exact in both engines). The 95%
interval is the nearest-rank 2nd/31st of the 32 replicate means.
Complements q140's jackknife (leave-one-bucket-out, systematic) with
the replicate-weight family every large-scale eval actually ships.

Scale shape: explode x32 is map-side generation feeding a 32-group
partial aggregation — one corpus scan, one 32-row shuffle; the CI
window runs over 32 rows.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkextract.queries.base import load, register

# ---------------------------------------------------------------------
# q190
_Q190_EPS = 1.0  # epsilon; sensitivity of a count is 1 -> b = 1/eps
_Q190_SALT = "q190dp"

_Q190_U = (
    f"(CAST(CAST(('0x' || SUBSTRING(md5('{_Q190_SALT}:' || source), 1, 8)) AS UBIGINT)"
    f" % 1000000 AS DOUBLE) + 0.5) / 1000000.0"
)

_Q190_ORACLE = f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS true_n FROM documents GROUP BY source
),
noised AS (
  SELECT source, true_n,
         ROUND(-(1.0 / {_Q190_EPS})
               * CASE WHEN {_Q190_U} >= 0.5 THEN 1.0 ELSE -1.0 END
               * ln(1.0 - 2.0 * ABS({_Q190_U} - 0.5)), 6) AS noise
  FROM counts
),
ranked AS (
  SELECT source, true_n, noise,
         ROUND(CAST(true_n AS DOUBLE) + noise, 6) AS noisy,
         CAST(RANK() OVER (ORDER BY true_n DESC, source ASC) AS BIGINT)
           AS rank_true,
         CAST(RANK() OVER (ORDER BY ROUND(CAST(true_n AS DOUBLE) + noise, 6) DESC,
                           source ASC) AS BIGINT) AS rank_noisy
  FROM noised
)
SELECT source, true_n, noise, noisy, rank_true, rank_noisy,
       CAST(ABS(rank_true - rank_noisy) AS BIGINT) AS rank_shift,
       ROUND(ABS(noise), 6) AS l1_err
FROM ranked
"""


@register("q190_dp_noisy_release", oracle=_Q190_ORACLE)
def q190_dp_noisy_release(spark, sf_dir):
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    u = (
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(_Q190_SALT + ":"), F.col("source"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 1000000
        ).cast("double")
        + 0.5
    ) / 1000000.0
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.round(
        -(1.0 / _Q190_EPS) * sign * F.log(1.0 - 2.0 * F.abs(u - 0.5)), 6
    )
    noised = counts.select("source", "true_n", noise.alias("noise"))
    noisy = F.round(F.col("true_n").cast("double") + F.col("noise"), 6)
    wt = Window.orderBy(F.desc("true_n"), F.asc("source"))
    wn = Window.orderBy(F.desc("noisy"), F.asc("source"))
    ranked = noised.withColumn("noisy", noisy).select(
        "source",
        "true_n",
        "noise",
        "noisy",
        F.rank().over(wt).cast("long").alias("rank_true"),
        F.rank().over(wn).cast("long").alias("rank_noisy"),
    )
    return ranked.select(
        "source",
        "true_n",
        "noise",
        "noisy",
        "rank_true",
        "rank_noisy",
        F.abs(F.col("rank_true") - F.col("rank_noisy")).cast("long").alias("rank_shift"),
        F.round(F.abs("noise"), 6).alias("l1_err"),
    )


# ---------------------------------------------------------------------
# q191
_Q191_REPS = 32
_Q191_SALT = "q191boot"

# inverse-CDF thresholds for Poisson(1) in integer micro-units:
# w = min index k with u_micro < threshold[k]; exact integer compares.
# The table stops at the first micro-unit saturation (CDF == 1 at this
# resolution) — u < 1e6 always, so larger weights are unreachable.
_Q191_THRESH = []
_acc = 0.0
for _k in range(32):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _Q191_THRESH.append(min(int(round(_acc * 1_000_000)), 1_000_000))
    if _Q191_THRESH[-1] >= 1_000_000:
        break

_Q191_U = (
    f"CAST(CAST(('0x' || SUBSTRING(md5('{_Q191_SALT}:' || CAST(doc_id AS VARCHAR)"
    f" || ':' || CAST(r AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000000 AS BIGINT)"
)


def _q191_w_sql(u_expr: str) -> str:
    branches = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(_Q191_THRESH)
    )
    return f"(CASE {branches} ELSE {len(_Q191_THRESH)} END)"


_Q191_ORACLE = f"""
WITH reps AS (
  SELECT d.doc_id, d.n_chars, r.r
  FROM documents d,
       (SELECT unnest(range({_Q191_REPS})) AS r) r
),
w AS (
  SELECT r, n_chars, {_q191_w_sql(_Q191_U)} AS w FROM reps
),
boot AS (
  SELECT CAST(r AS BIGINT) AS r,
         CAST(SUM(w) AS BIGINT) AS n_eff,
         CAST(SUM(w * n_chars) AS BIGINT) AS wsum
  FROM w GROUP BY r
),
means AS (
  SELECT r, n_eff,
         ROUND(CAST(wsum AS DOUBLE) / CAST(n_eff AS DOUBLE), 6) AS boot_mean
  FROM boot
),
ranked AS (
  SELECT r, n_eff, boot_mean,
         ROW_NUMBER() OVER (ORDER BY boot_mean ASC, r ASC) AS rn
  FROM means
),
ci AS (
  SELECT MAX(CASE WHEN rn = 2 THEN boot_mean END) AS ci_lo,
         MAX(CASE WHEN rn = {_Q191_REPS - 1} THEN boot_mean END) AS ci_hi
  FROM ranked
)
SELECT r, n_eff, boot_mean, ci.ci_lo, ci.ci_hi
FROM ranked CROSS JOIN ci
"""


@register("q191_poisson_bootstrap", oracle=_Q191_ORACLE)
def q191_poisson_bootstrap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_Q191_REPS - 1))).alias("r"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_Q191_SALT + ":"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    w = F.lit(len(_Q191_THRESH))
    for k in range(len(_Q191_THRESH) - 1, -1, -1):
        w = F.when(u < _Q191_THRESH[k], F.lit(k)).otherwise(w)
    boot = (
        reps.withColumn("w", w)
        .groupBy("r")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(F.col("w") * F.col("n_chars")).cast("long").alias("wsum"),
        )
    )
    means = boot.select(
        F.col("r").cast("long").alias("r"),
        "n_eff",
        F.round(F.col("wsum").cast("double") / F.col("n_eff").cast("double"), 6).alias(
            "boot_mean"
        ),
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.asc("boot_mean"), F.asc("r")))
    )
    ci = ranked.agg(
        F.max(F.when(F.col("rn") == 2, F.col("boot_mean"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == _Q191_REPS - 1, F.col("boot_mean"))).alias("ci_hi"),
    )
    return ranked.select("r", "n_eff", "boot_mean").crossJoin(F.broadcast(ci))
