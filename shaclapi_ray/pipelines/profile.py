"""Column-statistics profiling + exact distribution-drift (PSI) checks.

North-rule coverage: "column stats, uniqueness, referential,
distribution-drift checks" — this module is the column-stats profiler
and the EXACT (SQL-oracle-checked) PSI drift test; the approximate
t-digest/KS path lives in engine._eval_drift (reference analog:
shaclAPI's per-shape statistics in shaclapi/reduction — recast as
table-level profiling rather than SPARQL endpoint stats).

Scale shape:
- ``profile_columns``: ONE fused map_batches pass computes per-batch
  partials for every column (counts, nulls, min/max, length sums) —
  partial rows are #batches × #columns, combined in a tiny groupby.
  Exact distinct counts melt each batch to narrow (column, hash64)
  rows, pre-deduped per batch, then two keyed aggregations — the only
  data-sized shuffle, on 12-byte rows. At 10^12 rows swap the 64-bit
  hash for 128-bit (birthday bound) — noted where it happens.
- ``psi_drift``: per-batch vectorized (host, bin, side) counts, one
  tiny groupby-sum (hosts × bins × 2 rows), PSI formula on the driver
  over that small frame. No full-data shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.pipelines.textstats import TOKEN_RE

HOST_RE = r"^https?://([^/]+)"

# profiled pages columns -> kind: how min/max/len are computed
PAGE_COLUMNS = {
    "url": "string",
    "warc_ts": "timestamp",
    "html": "binary",
    "text": "string",
    "lang": "string",
}


def _col_partials(batch: pa.Table, columns: dict[str, str]) -> pa.Table:
    """One partial row per profiled column for this batch."""
    out = {
        "column": [],
        "n_rows": [],
        "n_nulls": [],
        "min_v": [],
        "max_v": [],
        "len_sum": [],
    }
    for name, kind in columns.items():
        col = batch[name]
        n = len(col)
        nulls = col.null_count
        if kind == "string":
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            lsum = pc.sum(pc.utf8_length(col)).as_py() or 0
        elif kind == "timestamp":
            us = pc.cast(col, pa.int64())
            mm = pc.min_max(us)
            mn = None if mm["min"].as_py() is None else str(mm["min"].as_py())
            mx = None if mm["max"].as_py() is None else str(mm["max"].as_py())
            lsum = 0
        else:  # binary
            mn = mx = None
            lsum = pc.sum(pc.binary_length(col)).as_py() or 0
        out["column"].append(name)
        out["n_rows"].append(n)
        out["n_nulls"].append(nulls)
        out["min_v"].append(mn)
        out["max_v"].append(mx)
        out["len_sum"].append(lsum)
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "min_v": pa.array(out["min_v"], pa.string()),
            "max_v": pa.array(out["max_v"], pa.string()),
            "len_sum": pa.array(out["len_sum"], pa.int64()),
        }
    )


def _distinct_melt(batch: pa.Table, columns: dict[str, str]) -> pa.Table:
    """Narrow (column, h) rows: per-batch-deduped 64-bit value hashes.
    Nulls are DROPPED (matching SQL COUNT(DISTINCT)).

    64-bit process-stable polars hash — collision-free in practice at
    test scales; at 10^12 rows switch to a 128-bit hash (two seeds,
    struct key) or the distinct count undercounts by the birthday bound.
    """
    import polars as pl

    names, hs = [], []
    for name, kind in columns.items():
        col = batch[name]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if kind == "timestamp":
            arr = pc.cast(arr, pa.int64())
        if kind == "binary":
            s = pl.from_arrow(arr).bin.encode("hex")
        else:
            s = pl.from_arrow(arr).cast(pl.Utf8)
        h = s.drop_nulls().hash(seed=0).unique()
        names.extend([name] * len(h))
        hs.append(h.to_numpy().view(np.int64))
    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "h": pa.array(
                np.concatenate(hs) if hs else np.array([], dtype=np.int64),
                pa.int64(),
            ),
        }
    )


def profile_columns(pages_ds, columns: dict[str, str] | None = None):
    """Per-column stats over the pages table: (column, n_rows, n_nulls,
    n_distinct, min_v, max_v, avg_len).

    min_v/max_v are VARCHAR: lexicographic for strings, epoch-micros
    (stringified int64) for timestamps, NULL for binary. avg_len is the
    mean utf8/byte length over ALL rows (nulls excluded from the sum but
    included in neither numerator nor denominator — denominator is
    non-null count), NULL for timestamps.
    """
    import pandas as pd

    columns = columns or PAGE_COLUMNS

    stats = pages_ds.map_batches(
        lambda t: _col_partials(t, columns), batch_format="pyarrow"
    )
    # tiny combine: #batches × #columns rows, one group per column
    def combine(g: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "column": [g["column"].iloc[0]],
                "n_rows": [int(g["n_rows"].sum())],
                "n_nulls": [int(g["n_nulls"].sum())],
                "min_v": [g["min_v"].dropna().min() if g["min_v"].notna().any() else None],
                "max_v": [g["max_v"].dropna().max() if g["max_v"].notna().any() else None],
                "len_sum": [int(g["len_sum"].sum())],
            }
        )

    combined = stats.groupby("column").map_groups(combine, batch_format="pandas")

    distinct = (
        pages_ds.map_batches(
            lambda t: _distinct_melt(t, columns), batch_format="pyarrow"
        )
        .groupby(["column", "h"])
        .count()
        .groupby("column")
        .count()
    )

    sdf = combined.to_pandas()
    ddf = distinct.to_pandas().rename(columns={"count()": "n_distinct"})
    df = sdf.merge(ddf[["column", "n_distinct"]], on="column", how="left")
    nn = df["n_rows"] - df["n_nulls"]
    df["avg_len"] = np.where(nn > 0, df["len_sum"] / nn.clip(lower=1), np.nan)
    df.loc[[columns.get(c) == "timestamp" for c in df["column"]], "avg_len"] = np.nan
    df["n_distinct"] = df["n_distinct"].astype("int64")
    return (
        df[["column", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v", "avg_len"]]
        .sort_values("column")
        .reset_index(drop=True)
    )


def profile_columns_sql(
    pages_dir: str | None = None,
    columns: dict[str, str] | None = None,
    rel: str | None = None,
) -> str:
    """DuckDB oracle for profile_columns — same stats per column.

    Timestamp min/max via epoch_us (exact integer parity with the Arrow
    int64 cast); distinct via COUNT(DISTINCT value) (the Ray side hashes
    — equality holds absent 64-bit collisions, guaranteed at gate scale).
    ``rel`` overrides the parquet scan with any relation expression (the
    profile_drift oracle profiles derived snapshot views)."""
    columns = columns or PAGE_COLUMNS
    if rel is None:
        rel = f"read_parquet('{pages_dir}/part-*.parquet')"
    parts = []
    for name, kind in columns.items():
        if kind == "string":
            mn = f"CAST(min({name}) AS VARCHAR)"
            mx = f"CAST(max({name}) AS VARCHAR)"
            ln = f"avg(length({name}))"
        elif kind == "timestamp":
            mn = f"CAST(min(epoch_us({name})) AS VARCHAR)"
            mx = f"CAST(max(epoch_us({name})) AS VARCHAR)"
            ln = "CAST(NULL AS DOUBLE)"
        else:
            mn = "CAST(NULL AS VARCHAR)"
            mx = "CAST(NULL AS VARCHAR)"
            ln = f"avg(octet_length({name}))"
        parts.append(
            f'SELECT \'{name}\' AS "column", count(*) AS n_rows, '
            f"count(*) - count({name}) AS n_nulls, "
            f"count(DISTINCT {name}) AS n_distinct, "
            f"{mn} AS min_v, {mx} AS max_v, {ln} AS avg_len FROM {rel}"
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


# ---------------------------------------------------------------------------
# Constraint suggestion (Deequ-style) from the column profile
# ---------------------------------------------------------------------------

SUGGEST_LOW_CARD_MAX = 16


def suggest_constraints(profile_df, low_card_max: int = SUGGEST_LOW_CARD_MAX):
    """(column, rule, param): deterministic Deequ-style constraint
    suggestions derived from a ``profile_columns`` frame — the profiler's
    forward companion to the reference's schema REDUCTION (reduce takes a
    schema and prunes it; suggest takes data and proposes one). Rules are
    integer-exact over the profile stats, so the suggestion set is
    reproducible across runs/layouts and SQL-mirrorable:

    - ``not_null``     n_nulls == 0 (and n_rows > 0 — no vacuous
                       suggestions from an empty column)
    - ``unique``       n_distinct == n_rows - n_nulls (> 0 non-nulls;
                       nulls excluded exactly like COUNT(DISTINCT))
    - ``low_card``     1 <= n_distinct <= low_card_max (membership-check
                       candidate; param = the observed cardinality)
    - ``value_range``  min_v non-null (param = 'min..max' — epoch-micros
                       for timestamps, lexicographic bounds for strings)

    Driver-side over the tiny |columns|-row profile — the distributed
    work is profile_columns itself. ``suggestions_to_shape`` turns the
    output into a runnable Shape for the validation engine."""
    import pandas as pd

    rows = []
    for r in profile_df.itertuples():
        nn = int(r.n_rows) - int(r.n_nulls)
        if int(r.n_rows) > 0 and int(r.n_nulls) == 0:
            rows.append((r.column, "not_null", ""))
        if 1 <= int(r.n_distinct) <= low_card_max:
            rows.append((r.column, "low_card", str(int(r.n_distinct))))
        if nn > 0 and int(r.n_distinct) == nn:
            rows.append((r.column, "unique", ""))
        if pd.notna(r.min_v) and r.min_v is not None:
            mx = r.max_v if (pd.notna(r.max_v) and r.max_v is not None) else ""
            rows.append((r.column, "value_range", f"{r.min_v}..{mx}"))
    return (
        pd.DataFrame(rows, columns=["column", "rule", "param"])
        .sort_values(["column", "rule"])
        .reset_index(drop=True)
    )


def suggest_constraints_sql(
    pages_dir: str,
    columns: dict[str, str] | None = None,
    low_card_max: int = SUGGEST_LOW_CARD_MAX,
) -> str:
    """DuckDB oracle for suggest_constraints — the same integer rules as
    a CTE over profile_columns_sql."""
    prof = profile_columns_sql(pages_dir, columns)
    return f"""
WITH prof AS ({prof})
SELECT * FROM (
  SELECT "column", 'not_null' AS rule, '' AS param FROM prof
  WHERE n_rows > 0 AND n_nulls = 0
  UNION ALL
  SELECT "column", 'low_card' AS rule, CAST(n_distinct AS VARCHAR) AS param
  FROM prof WHERE n_distinct BETWEEN 1 AND {low_card_max}
  UNION ALL
  SELECT "column", 'unique' AS rule, '' AS param FROM prof
  WHERE n_rows - n_nulls > 0 AND n_distinct = n_rows - n_nulls
  UNION ALL
  SELECT "column", 'value_range' AS rule, min_v || '..' || COALESCE(max_v, '') AS param
  FROM prof WHERE min_v IS NOT NULL
) ORDER BY "column", rule
"""


def profile_and_suggest(
    pages_ds,
    columns: dict[str, str] | None = None,
    low_card_max: int = SUGGEST_LOW_CARD_MAX,
):
    """pages -> suggestion rows as a Dataset (the CLI-composable form of
    profile_columns + suggest_constraints; the result is |columns|-scale
    tiny, so the driver-side from_pandas is free)."""
    import ray.data

    return ray.data.from_pandas(
        suggest_constraints(profile_columns(pages_ds, columns), low_card_max)
    )


# drift tolerances as exact rationals (num, den) — cross-multiplied, never
# a float ratio, so the Ray and SQL verdicts agree bit-for-bit
DRIFT_ROW_DELTA = (1, 2)  # row count moved by > 50%
DRIFT_NULLRATE_DELTA = (1, 20)  # null rate moved by > 5 points
DRIFT_DISTINCT_DELTA = (1, 2)  # distinct/non-null ratio moved by > 50 points


def profile_drift(
    old_pages_ds,
    new_pages_ds,
    columns: dict[str, str] | None = None,
    row_delta: tuple[int, int] = DRIFT_ROW_DELTA,
    nullrate_delta: tuple[int, int] = DRIFT_NULLRATE_DELTA,
    distinct_delta: tuple[int, int] = DRIFT_DISTINCT_DELTA,
):
    """(column, check, drifted, old_v, new_v): Deequ-style anomaly
    detection between two crawl snapshots' column profiles — the
    schema-level companion to the value-level ``psi_drift`` and the
    row-level ``snapshot_delta``. Four checks per column:

    - ``row_count``      |n_new - n_old| * den > num * n_old
                         (n_old == 0: any new rows drift)
    - ``null_rate``      |nulls_new*rows_old - nulls_old*rows_new| * den
                         > num * rows_old * rows_new (skipped when either
                         side is empty)
    - ``distinct_ratio`` the same cross-multiplied rule over
                         n_distinct / non-null count
    - ``range_expansion`` the new [min, max] escapes the old one
                         (numeric for timestamps, lexicographic for
                         strings; a bound appearing where the old side
                         had none is drift; binary columns skip)

    All arithmetic is driver-side exact Python ints over the two
    |columns|-row profiles (no int64 overflow at 10^12 rows); the
    distributed work is the two profile_columns passes."""
    import pandas as pd

    columns = columns or PAGE_COLUMNS
    po = profile_columns(old_pages_ds, columns).set_index("column")
    pn = profile_columns(new_pages_ds, columns).set_index("column")
    rn, rd = row_delta
    nn_, nd = nullrate_delta
    dn, dd = distinct_delta
    rows = []
    for col in sorted(columns):
        o, n = po.loc[col], pn.loc[col]
        o_rows, n_rows = int(o.n_rows), int(n.n_rows)
        o_nulls, n_nulls = int(o.n_nulls), int(n.n_nulls)
        o_nn, n_nn = o_rows - o_nulls, n_rows - n_nulls

        drift = abs(n_rows - o_rows) * rd > rn * o_rows
        rows.append((col, "row_count", drift, str(o_rows), str(n_rows)))

        if o_rows > 0 and n_rows > 0:
            drift = abs(n_nulls * o_rows - o_nulls * n_rows) * nd > nn_ * o_rows * n_rows
        else:
            drift = False
        rows.append(
            (col, "null_rate", drift, f"{o_nulls}/{o_rows}", f"{n_nulls}/{n_rows}")
        )

        if o_nn > 0 and n_nn > 0:
            drift = (
                abs(int(n.n_distinct) * o_nn - int(o.n_distinct) * n_nn) * dd
                > dn * o_nn * n_nn
            )
        else:
            drift = False
        rows.append(
            (
                col,
                "distinct_ratio",
                drift,
                f"{int(o.n_distinct)}/{o_nn}",
                f"{int(n.n_distinct)}/{n_nn}",
            )
        )

        if columns[col] == "binary":
            drift, ov, nv = False, "", ""
        else:
            omin = o.min_v if pd.notna(o.min_v) else None
            omax = o.max_v if pd.notna(o.max_v) else None
            nmin = n.min_v if pd.notna(n.min_v) else None
            nmax = n.max_v if pd.notna(n.max_v) else None
            if columns[col] == "timestamp":
                conv = int
            else:
                conv = str
            if nmin is None:
                drift = False
            elif omin is None:
                drift = True
            else:
                drift = conv(nmin) < conv(omin) or conv(nmax) > conv(omax)
            ov = "" if omin is None else f"{omin}..{omax}"
            nv = "" if nmin is None else f"{nmin}..{nmax}"
        rows.append((col, "range_expansion", drift, ov, nv))
    return (
        pd.DataFrame(rows, columns=["column", "check", "drifted", "old_v", "new_v"])
        .sort_values(["column", "check"])
        .reset_index(drop=True)
    )


def profile_drift_sql(
    old_rel: str,
    new_rel: str,
    columns: dict[str, str] | None = None,
    row_delta: tuple[int, int] = DRIFT_ROW_DELTA,
    nullrate_delta: tuple[int, int] = DRIFT_NULLRATE_DELTA,
    distinct_delta: tuple[int, int] = DRIFT_DISTINCT_DELTA,
) -> str:
    """DuckDB oracle for profile_drift: the same cross-multiplied integer
    rules over two profile_columns CTEs (HUGEINT casts keep the products
    exact at any row count). ``old_rel`` / ``new_rel`` are relation
    expressions (parenthesized SELECTs or table names)."""
    columns = columns or PAGE_COLUMNS
    rn, rd = row_delta
    nn_, nd = nullrate_delta
    dn, dd = distinct_delta
    h = "CAST({} AS HUGEINT)"
    ts_cols = ", ".join(f"'{c}'" for c, k in columns.items() if k == "timestamp")
    bin_cols = ", ".join(f"'{c}'" for c, k in columns.items() if k == "binary")
    range_old = "CASE WHEN o_min IS NULL THEN '' ELSE o_min || '..' || o_max END"
    range_new = "CASE WHEN n_min IS NULL THEN '' ELSE n_min || '..' || n_max END"
    return f"""
WITH po AS ({profile_columns_sql(columns=columns, rel=old_rel)}),
     pn AS ({profile_columns_sql(columns=columns, rel=new_rel)}),
     j AS (SELECT o."column" AS col, o.n_rows AS o_rows, n.n_rows AS n_rows,
                  o.n_nulls AS o_nulls, n.n_nulls AS n_nulls,
                  o.n_distinct AS o_d, n.n_distinct AS n_d,
                  o.min_v AS o_min, o.max_v AS o_max,
                  n.min_v AS n_min, n.max_v AS n_max
           FROM po o JOIN pn n ON o."column" = n."column")
SELECT * FROM (
  SELECT col AS "column", 'row_count' AS "check",
         abs({h.format('n_rows')} - o_rows) * {rd} > {rn} * {h.format('o_rows')} AS drifted,
         CAST(o_rows AS VARCHAR) AS old_v, CAST(n_rows AS VARCHAR) AS new_v
  FROM j
  UNION ALL
  SELECT col, 'null_rate',
         CASE WHEN o_rows > 0 AND n_rows > 0 THEN
           abs({h.format('n_nulls')} * o_rows - {h.format('o_nulls')} * n_rows) * {nd}
             > {nn_} * {h.format('o_rows')} * n_rows
         ELSE FALSE END,
         o_nulls || '/' || o_rows, n_nulls || '/' || n_rows
  FROM j
  UNION ALL
  SELECT col, 'distinct_ratio',
         CASE WHEN o_rows - o_nulls > 0 AND n_rows - n_nulls > 0 THEN
           abs({h.format('n_d')} * (o_rows - o_nulls) - {h.format('o_d')} * (n_rows - n_nulls)) * {dd}
             > {dn} * {h.format('(o_rows - o_nulls)')} * (n_rows - n_nulls)
         ELSE FALSE END,
         o_d || '/' || (o_rows - o_nulls), n_d || '/' || (n_rows - n_nulls)
  FROM j
  UNION ALL
  SELECT col, 'range_expansion',
         CASE
           WHEN col IN ({bin_cols or "''"}) THEN FALSE
           WHEN n_min IS NULL THEN FALSE
           WHEN o_min IS NULL THEN TRUE
           WHEN col IN ({ts_cols or "''"}) THEN
             CAST(n_min AS HUGEINT) < CAST(o_min AS HUGEINT)
             OR CAST(n_max AS HUGEINT) > CAST(o_max AS HUGEINT)
           ELSE n_min < o_min OR n_max > o_max
         END,
         CASE WHEN col IN ({bin_cols or "''"}) THEN '' ELSE {range_old} END,
         CASE WHEN col IN ({bin_cols or "''"}) THEN '' ELSE {range_new} END
  FROM j
) ORDER BY "column", "check"
"""


def suggestions_to_shape(
    sugg_df,
    shape_id: str = "SuggestedShape",
    columns: dict[str, str] | None = None,
):
    """Compile a suggestion frame into a runnable ``Shape``: not_null ->
    not-null predicates, unique -> UniqueConstraint (sketch stage),
    timestamp value_range -> an exact range predicate (epoch-micros
    bounds round-trip losslessly through ISO microsecond strings).
    low_card and string/binary value_range rows are advisory (they name
    a candidate check but not its value set) and compile to nothing."""
    from shaclapi_ray.shapes.ir import (
        PredicateConstraint,
        Shape,
        UniqueConstraint,
    )

    columns = columns or PAGE_COLUMNS
    cons = []
    for r in sugg_df.itertuples():
        if r.rule == "not_null":
            cons.append(
                PredicateConstraint(
                    name=f"{r.column}_not_null",
                    pred={"op": "not_null", "column": r.column},
                )
            )
        elif r.rule == "unique":
            cons.append(UniqueConstraint(name=f"{r.column}_unique", column=r.column))
        elif r.rule == "value_range" and columns.get(r.column) == "timestamp":
            lo_us, hi_us = (int(v) for v in r.param.split(".."))
            cons.append(
                PredicateConstraint(
                    name=f"{r.column}_range",
                    pred={
                        "op": "range",
                        "column": r.column,
                        "min": str(np.datetime64(lo_us, "us")),
                        "max": str(np.datetime64(hi_us, "us")),
                    },
                )
            )
    return Shape(shape_id=shape_id, target=None, constraints=cons)


# ---------------------------------------------------------------------------
# Exact PSI drift
# ---------------------------------------------------------------------------

PSI_BIN_WIDTH = 500
PSI_N_BINS = 10
PSI_SPLIT_TS = "2017-01-01 00:00:00"  # ref = warc_ts < split, cur = rest
PSI_EPS = 0.5  # Laplace smoothing per bin
PSI_THRESHOLD = 0.2


def psi_drift(
    pages_ds,
    bin_width: int = PSI_BIN_WIDTH,
    n_bins: int = PSI_N_BINS,
    split_ts: str = PSI_SPLIT_TS,
    threshold: float = PSI_THRESHOLD,
):
    """Per-host Population Stability Index of the text-length
    distribution, reference slice = rows with warc_ts < ``split_ts``,
    current slice = the rest. Returns (host, n_ref, n_cur, psi, drifted).

    Exact (integer bin counts + closed-form PSI), unlike the t-digest/KS
    DriftConstraint path — this is the oracle-checked drift operator.
    Bins: least(len(text) // bin_width, n_bins - 1); null text counts as
    length 0; rows with null url get host ''. PSI uses Laplace-smoothed
    proportions p_i=(c_i+eps)/(tot+eps*n_bins) so empty bins are finite.
    """
    import pandas as pd
    import polars as pl

    split_us = int(pd.Timestamp(split_ts).value // 1000)

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch["url"].combine_chunks() if isinstance(
            batch["url"], pa.ChunkedArray
        ) else batch["url"]
        host = (
            pl.from_arrow(urls).fill_null("").str.extract(HOST_RE, 1).fill_null("")
        )
        ln = np.asarray(pc.fill_null(pc.utf8_length(batch["text"]), 0))
        b = np.minimum(ln // bin_width, n_bins - 1).astype(np.int64)
        # null warc_ts counts as "current" (SQL: COALESCE(ts < split, FALSE))
        ts = np.asarray(
            pc.fill_null(pc.cast(batch["warc_ts"], pa.int64()), split_us)
        )
        is_ref = ts < split_us
        g = (
            pl.DataFrame({"host": host, "bin": b, "is_ref": is_ref})
            .group_by(["host", "bin", "is_ref"])
            .len()
        )
        return g.rename({"len": "cnt"}).to_arrow().cast(
            pa.schema(
                [
                    ("host", pa.string()),
                    ("bin", pa.int64()),
                    ("is_ref", pa.bool_()),
                    ("cnt", pa.int64()),
                ]
            )
        )

    counts = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "bin", "is_ref"])
        .sum("cnt")
        .to_pandas()
    )
    # small frame: hosts × bins × 2 — PSI per host on the driver
    rows = []
    for host, g in counts.groupby("host"):
        ref = np.zeros(n_bins)
        cur = np.zeros(n_bins)
        for _, r in g.iterrows():
            (ref if r["is_ref"] else cur)[int(r["bin"])] = r["sum(cnt)"]
        n_ref, n_cur = ref.sum(), cur.sum()
        p = (ref + PSI_EPS) / (n_ref + PSI_EPS * n_bins)
        q = (cur + PSI_EPS) / (n_cur + PSI_EPS * n_bins)
        psi = float(((p - q) * np.log(p / q)).sum())
        rows.append(
            {
                "host": host,
                "n_ref": int(n_ref),
                "n_cur": int(n_cur),
                "psi": psi,
                "drifted": psi > threshold,
            }
        )
    return (
        pd.DataFrame(rows, columns=["host", "n_ref", "n_cur", "psi", "drifted"])
        .sort_values("host")
        .reset_index(drop=True)
    )


def psi_drift_sql(
    pages_dir: str,
    bin_width: int = PSI_BIN_WIDTH,
    n_bins: int = PSI_N_BINS,
    split_ts: str = PSI_SPLIT_TS,
    threshold: float = PSI_THRESHOLD,
) -> str:
    """DuckDB oracle for psi_drift — identical binning, smoothing, PSI."""
    rel = f"read_parquet('{pages_dir}/part-*.parquet')"
    eps = PSI_EPS
    return f"""
WITH rowsx AS (
  SELECT COALESCE(regexp_extract(url, '{HOST_RE}', 1), '') AS host,
         LEAST(COALESCE(length(text), 0) // {bin_width}, {n_bins - 1}) AS bin,
         COALESCE(warc_ts < TIMESTAMP '{split_ts}', FALSE) AS is_ref
  FROM {rel}
), counts AS (
  SELECT host, bin, is_ref, count(*) AS cnt FROM rowsx GROUP BY ALL
), tot AS (
  SELECT host,
         sum(CASE WHEN is_ref THEN cnt ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN cnt ELSE 0 END) AS n_cur
  FROM counts GROUP BY host
), grid AS (
  SELECT t.host, b.bin, t.n_ref, t.n_cur,
         COALESCE((SELECT cnt FROM counts c
                   WHERE c.host = t.host AND c.bin = b.bin AND c.is_ref), 0) AS rc,
         COALESCE((SELECT cnt FROM counts c
                   WHERE c.host = t.host AND c.bin = b.bin AND NOT c.is_ref), 0) AS cc
  FROM tot t CROSS JOIN (SELECT unnest(range({n_bins})) AS bin) b
), psi AS (
  SELECT host, CAST(max(n_ref) AS BIGINT) AS n_ref, CAST(max(n_cur) AS BIGINT) AS n_cur,
         sum(((rc + {eps}) / (n_ref + {eps * n_bins})
              - (cc + {eps}) / (n_cur + {eps * n_bins}))
             * ln(((rc + {eps}) / (n_ref + {eps * n_bins}))
                  / ((cc + {eps}) / (n_cur + {eps * n_bins})))
            ) AS psi
  FROM grid GROUP BY host
)
SELECT host, n_ref, n_cur, psi, (psi > {threshold}) AS drifted
FROM psi ORDER BY host
"""


def heavy_hitters(ds, col: str, k: int = 5, width: int = 8192, depth: int = 4):
    """(value, n_exact, n_cms): the k most frequent values of ``col``
    (ties break value-asc) with BOTH the exact count and the merged
    Count-Min estimate — the sketch's one-sided error (n_cms >= n_exact,
    small overshoot whp) is thereby visible, and the golden pins it.

    Scale shape: ONE streaming pass over the wide data emits per-batch
    (value, cnt) count partials; the merged CMS is built from those
    NARROW partials with weighted adds (integer adds commute -> the
    sketch is layout-independent), and the exact counts combine through
    the auto driver-merge/shuffle path (exchange proportional to the
    DISTINCT values — hosts/domains, not rows). At corpora where even
    the distinct exchange is too wide, drop the exact leg and rank by
    CMS over per-batch candidate top-m; here the exact leg doubles as
    the estimate's verification."""
    from shaclapi_ray.stages.aggregates import combine_partials, partial_counts
    from shaclapi_ray.state.sketches import CountMinSketch

    partials = partial_counts(ds, col).materialize()
    merged = CountMinSketch(width=width, depth=depth)
    for b in partials.iter_batches(batch_format="pyarrow"):
        merged.add_array(b[col], weights=b["cnt"].to_numpy(zero_copy_only=False))

    counts = combine_partials(partials, col, "cnt", "n_exact").to_pandas()
    counts = counts.rename(columns={col: "value"})
    counts = counts.sort_values(
        ["n_exact", "value"], ascending=[False, True], kind="mergesort"
    ).head(k)
    est = merged.estimate_array(pa.array(counts["value"].tolist(), pa.string()))
    counts["n_cms"] = est.astype("int64")
    return counts.reset_index(drop=True)


def corpus_composition(pages_ds, *, period: str = "month",
                       url_col: str = "url", ts_col: str = "warc_ts",
                       text_col: str = "text", lang_col: str = "lang"):
    """(host, period_us, lang, n_docs, n_tokens): the corpus-card
    rollup — document and whitespace-token share per (host, capture
    period, language) — every Dolma/Pile-style mixture plan and crawl
    dashboard starts here. ``period`` is 'month' or 'day'; period_us =
    epoch microseconds of the calendar-truncated warc_ts (-1 for null
    ts, its own bucket). Token count is the repo-standard
    ``\\S+``-run count (hostcure's oracle expression), null text = 0;
    null lang stays its own group.

    Scale: ONE streaming pass of per-batch polars group_by partials —
    rows per batch ∝ distinct (host, period, lang) in the batch, not
    docs — combined by stages.aggregates.combine_partials_multi (auto
    driver-merge below 5M partial rows, Ray shuffle above). Reads only
    (url, warc_ts, text, lang); no corpus-sized exchange anywhere.
    Mirrored by oracles.corpus_composition_sql (exact integers)."""
    import polars as pl

    from shaclapi_ray.pipelines.hostcure import _host_expr
    from shaclapi_ray.stages.aggregates import combine_partials_multi

    if period not in ("month", "day"):
        raise ValueError(f"unknown period {period!r}")
    every = "1mo" if period == "month" else "1d"

    schema = pa.schema(
        [
            ("host", pa.string()),
            ("period_us", pa.int64()),
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        df = pl.DataFrame(
            {
                "host": pl.Series(_host_expr(batch[url_col])),
                "ts": pl.from_arrow(
                    batch[ts_col].combine_chunks()
                    if isinstance(batch[ts_col], pa.ChunkedArray)
                    else batch[ts_col]
                ),
                "n_tok": pl.from_arrow(batch[text_col])
                .str.count_matches(TOKEN_RE)
                .fill_null(0)
                .cast(pl.Int64),
                "lang": pl.from_arrow(batch[lang_col]),
            }
        )
        df = df.with_columns(
            pl.col("ts")
            .dt.truncate(every)
            .cast(pl.Int64)
            .fill_null(-1)
            .alias("period_us")
        )
        out = (
            df.group_by(["host", "period_us", "lang"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_tok").sum().alias("n_tokens"),
            )
            .select(["host", "period_us", "lang", "n_docs", "n_tokens"])
        )
        return out.to_arrow().cast(schema)

    parts = pages_ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    )
    return combine_partials_multi(
        parts, keys=["host", "period_us", "lang"],
        sums=["n_docs", "n_tokens"],
    )
