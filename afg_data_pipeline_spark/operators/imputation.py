"""Missing-value reconstruction — the reference's signature family.

Three selectable strategies behind one dispatcher, mirroring
paso_3_reconstruir_series (temperaturas_rm.py:157-178; default
'knn', unknown method falls back to knn per lines 171-172):

- W1 interpolate_linear: per-group time-weighted linear
  interpolation with forward/backward edge fill
  (temperaturas_rm.py:180-190) — pure window algebra, no UDF.
- W2 seasonal_median_impute: seasonal median with month/global
  fallbacks (temperaturas_rm.py:192-222) — windowed exact
  percentiles + a coalesce chain.
- W3 knn_impute: cross-sectional KNN, k=3, distance weights
  (temperaturas_rm.py:224-243, sklearn KNNImputer) — numpy inside
  applyInPandas (Arrow-batched; sklearn is not available in this
  container, and the math is 15 lines of numpy).

All three satisfy the reference-implied properties (SURVEY.md §5.3):
non-null values untouched, zero remaining nulls when every group has
at least one non-null, idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "value_filled",
) -> DataFrame:
    """W1: linear interpolation + ffill/bfill edges, per group.

    Reference: per comuna ordered by Fecha — interpolate('linear')
    then fillna(ffill) then fillna(bfill), temperaturas_rm.py:180-190.

    Implemented as window algebra (no UDF, stays in codegen):
    carry (prev value, prev position) with last(ignorenulls) over an
    unbounded-preceding frame and (next value, next position) with
    last(ignorenulls) over the REVERSED ordering's unbounded-
    preceding frame (never an unbounded-FOLLOWING frame — Spark
    evaluates those O(n²)/partition; see the comment at the window
    definitions below), then apply
    the time-weighted two-point formula. Interior nulls get the
    interpolation; head nulls coalesce to the next value (bfill),
    tail nulls to the prev value (ffill) — same outcome order as the
    reference's ffill-then-bfill since only edges reach the
    fallbacks.

    pandas interpolate('linear') is *index-position* linear; this is
    *time-weighted*. With one row per regular tick they coincide
    (SURVEY.md W1 caveat) — the characterization test pins it.

    ``order_col`` must be numeric (caller converts timestamps to a
    tick index). Cost shape: one shuffle on group_cols; both frames
    compute in a single window sort.
    """
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # "next non-null" == last non-null at-or-before current under the
    # REVERSED ordering. Spark evaluates unbounded-PRECEDING frames
    # incrementally (O(n) per partition) but re-scans the tail for
    # every row of an unbounded-following frame (O(n²)) — at 720
    # ticks/group that is 4x wall-clock, at 16k rows it was 11s.
    wn = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    o = F.col(order_col)
    prev_v = F.last(v, ignorenulls=True).over(wp)
    prev_o = F.last(F.when(v.isNotNull(), o), ignorenulls=True).over(wp)
    next_v = F.last(v, ignorenulls=True).over(wn)
    next_o = F.last(F.when(v.isNotNull(), o), ignorenulls=True).over(wn)
    interp = prev_v + (next_v - prev_v) * (
        (o - prev_o).cast("double") / (next_o - prev_o).cast("double")
    )
    return df.withColumn(out_col, F.coalesce(v, interp, prev_v, next_v))


def seasonal_median_impute(
    df: DataFrame,
    group_cols: list[str],
    season_col: str,
    coarse_season_col: str,
    value_col: str,
    out_col: str = "value_filled",
) -> DataFrame:
    """W2: seasonal-median imputation with two fallback levels.

    Reference: missing day gets the comuna's median for that
    dia_año; fallback month median; fallback comuna median
    (temperaturas_rm.py:192-222, aggregates at 202/213/216).

    Windowed exact percentiles (null-skipping, like pandas median)
    avoid the three join-backs of the naive translation: each
    partition computes its median in place. coalesce order = the
    reference's fallback chain.
    """
    v = F.col(value_col)
    w_season = Window.partitionBy(*group_cols, season_col)
    w_coarse = Window.partitionBy(*group_cols, coarse_season_col)
    w_group = Window.partitionBy(*group_cols)
    m_season = F.percentile(v, F.lit(0.5)).over(w_season)
    m_coarse = F.percentile(v, F.lit(0.5)).over(w_coarse)
    m_group = F.percentile(v, F.lit(0.5)).over(w_group)
    return df.withColumn(
        out_col, F.coalesce(v, m_season, m_coarse, m_group)
    )


def knn_impute(
    df: DataFrame,
    slice_col: str,
    feature_cols: list[str],
    value_col: str,
    k: int = 3,
    out_col: str = "value_filled",
) -> DataFrame:
    """W3: cross-sectional KNN imputation (k=3, distance weights).

    Reference: per date, KNNImputer(n_neighbors=3,
    weights='distance') over [Latitud, Longitud,
    Distancia_Estacion_km] — temperaturas_rm.py:224-243. Each date
    slice is small (≤ #groups rows), so applyInPandas per slice is
    the right physical shape: slices distribute across executors,
    numpy does the O(n²) distance math locally, Arrow moves the
    batches.

    Matches sklearn KNNImputer semantics for fully-observed
    features: euclidean distance on feature_cols, k nearest donors
    with non-null value, weights 1/d (exact-match donors d==0 get
    uniform weight, as sklearn does). Deterministic: donors sorted
    by (distance, row order), input sorted within slice.
    """
    import numpy as np
    import pandas as pd

    out_schema = df.withColumn(
        out_col, F.col(value_col).cast("double")
    ).schema

    cols = list(df.columns)

    def impute_slice(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(feature_cols + [value_col]).reset_index(
            drop=True
        )
        vals = pdf[value_col].to_numpy(dtype=float)
        feats = pdf[feature_cols].to_numpy(dtype=float)
        missing = np.isnan(vals)
        filled = vals.copy()
        if missing.any() and (~missing).any():
            donors = np.flatnonzero(~missing)
            dfeat = feats[donors]
            for i in np.flatnonzero(missing):
                d = np.sqrt(((dfeat - feats[i]) ** 2).sum(axis=1))
                order = np.argsort(d, kind="stable")[:k]
                dd = d[order]
                if (dd == 0).any():
                    sel = donors[order[dd == 0]]
                    filled[i] = vals[sel].mean()
                else:
                    wgt = 1.0 / dd
                    filled[i] = float(
                        (wgt * vals[donors[order]]).sum() / wgt.sum()
                    )
        pdf[out_col] = filled
        return pdf[cols + [out_col]]

    return df.groupBy(slice_col).applyInPandas(
        impute_slice, schema=out_schema
    )


def reconstruct_series(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    method: str = "knn",
    *,
    season_col: str | None = None,
    coarse_season_col: str | None = None,
    feature_cols: list[str] | None = None,
    out_col: str = "value_filled",
) -> DataFrame:
    """The W1/W2/W3 dispatcher.

    Reference: paso_3_reconstruir_series, temperaturas_rm.py:157-178
    — default 'knn'; an unknown method falls back to knn (lines
    171-172), reproduced faithfully here.
    """
    if method == "interpolacion":
        return interpolate_linear(
            df, group_cols, order_col, value_col, out_col
        )
    if method == "mediana_estacional":
        return seasonal_median_impute(
            df,
            group_cols,
            season_col or order_col,
            coarse_season_col or order_col,
            value_col,
            out_col,
        )
    # 'knn' and the reference's unknown-method fallback.
    return knn_impute(
        df,
        order_col,
        feature_cols or group_cols,
        value_col,
        out_col=out_col,
    )
