"""U5/A8/A11 — orbital-plane inclination pipeline, fully native.

Reference: collect_inclination_stats.py. Per snapshot: subtract the
bulk velocity (mean over stars within r_tidal) from all stars, take
wide & top-level & within-2x binary systems, gather each system's
component kinematics, compute the angular momentum about the
mass-weighted center of position, and summarize.

No UDF: explode component ids -> join star kinematics -> one
aggregation with weighted-CoM and cross-product sums (SURVEY §2.9 U5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.assemble import AssembledTables

KEY = ["run_id", "time"]


def system_inclinations(assembled: AssembledTables) -> DataFrame:
    """Per wide/top-level/within-2x system: inclination [rad].

    i = arccos(L_z / |L|), L = sum_i m_i * (r_i - r_com) x v_i with
    v already bulk-subtracted (collect_inclination_stats.py:25-53).
    NULL when |L| == 0 (NaN in the reference).
    """
    stars = assembled.stars
    bulk = stars.groupBy(*KEY).agg(
        *[
            F.avg(F.when(F.col("is_within_r_tidal"), F.col(v))).alias(f"_b{v}")
            for v in ("vx", "vy", "vz")
        ]
    )
    kin = (
        stars.join(bulk, KEY)
        .select(
            *KEY,
            "name",
            "x", "y", "z", "mass",
            (F.col("vx") - F.col("_bvx")).alias("vx"),
            (F.col("vy") - F.col("_bvy")).alias("vy"),
            (F.col("vz") - F.col("_bvz")).alias("vz"),
            "dist_dc_pc",
            "dist_dc_r_tidal",
        )
    )

    wide = assembled.binary_systems.filter(
        F.col("is_within_2x_r_tidal")
        & F.col("is_wide_binary_system")
        & F.col("is_top_level")
    )
    comp = wide.select(
        *KEY,
        "pair",
        F.posexplode(F.concat("obj1_ids", "obj2_ids")).alias("_pos", "name"),
    ).join(kin, [*KEY, "name"])

    # CoM of positions (np.average(r, weights=m)); velocities keep the
    # bulk-subtracted frame (reference subtracts no velocity CoM)
    g = comp.groupBy(*KEY, "pair")
    agg = g.agg(
        F.sum(F.col("mass") * F.col("x")).alias("_mx"),
        F.sum(F.col("mass") * F.col("y")).alias("_my"),
        F.sum(F.col("mass") * F.col("z")).alias("_mz"),
        F.sum("mass").alias("_m"),
        # raw cross-product sums: sum m * (r x v)
        F.sum(F.col("mass") * (F.col("y") * F.col("vz") - F.col("z") * F.col("vy"))).alias("_lx_raw"),
        F.sum(F.col("mass") * (F.col("z") * F.col("vx") - F.col("x") * F.col("vz"))).alias("_ly_raw"),
        F.sum(F.col("mass") * (F.col("x") * F.col("vy") - F.col("y") * F.col("vx"))).alias("_lz_raw"),
        # sum m*v (to shift the origin to the CoM afterwards)
        F.sum(F.col("mass") * F.col("vx")).alias("_mvx"),
        F.sum(F.col("mass") * F.col("vy")).alias("_mvy"),
        F.sum(F.col("mass") * F.col("vz")).alias("_mvz"),
        F.sort_array(F.collect_list(F.struct("_pos", "name"))).alias("_members"),
        F.sort_array(
            F.collect_list(F.struct("_pos", F.col("dist_dc_pc").alias("v")))
        ).alias("_dist_pc"),
        F.sort_array(
            F.collect_list(F.struct("_pos", F.col("dist_dc_r_tidal").alias("v")))
        ).alias("_dist_rt"),
    )
    # L about CoM: sum m (r - r_com) x v = sum m r x v - r_com x sum m v
    cx = F.col("_mx") / F.col("_m")
    cy = F.col("_my") / F.col("_m")
    cz = F.col("_mz") / F.col("_m")
    lx = F.col("_lx_raw") - (cy * F.col("_mvz") - cz * F.col("_mvy"))
    ly = F.col("_ly_raw") - (cz * F.col("_mvx") - cx * F.col("_mvz"))
    lz = F.col("_lz_raw") - (cx * F.col("_mvy") - cy * F.col("_mvx"))
    norm = F.sqrt(lx * lx + ly * ly + lz * lz)
    incl = F.when(norm > 0, F.acos(lz / norm))

    return agg.select(
        *KEY,
        "pair",
        F.transform("_members", lambda s: s.getField("name")).alias("names"),
        F.transform("_dist_pc", lambda s: s.getField("v")).alias("dist_pc"),
        F.transform("_dist_rt", lambda s: s.getField("v")).alias("dist_r_tidal"),
        incl.alias("inclination_rad"),
    )


def inclination_summary(
    assembled: AssembledTables, group_cols: list[str] | None = None
) -> DataFrame:
    """A11 — per-snapshot inclination summary
    (collect_inclination_stats.py:90-126): counts, JSON-encoded
    per-system lists (F23), mean/std in radians and degrees (std is
    the POPULATION std, np.std ddof=0)."""
    group_cols = group_cols or KEY
    sys_df = system_inclinations(assembled)
    # One struct per system, sorted by pair label: collect_list alone
    # is order-nondeterministic, and collecting the bare inclination
    # would DROP nulls — the reference keeps None placeholders aligned
    # with the names list, so undefined inclinations must survive as
    # JSON nulls inside the struct array.
    per_sys = sys_df.select(
        *group_cols,
        F.struct(
            "pair",
            "names",
            "dist_pc",
            "dist_r_tidal",
            F.col("inclination_rad").alias("rad"),
        ).alias("_sys"),
    )
    per_snap = per_sys.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_wide_bin_sys"),
        F.count("_sys.rad").cast("int").alias("n_defined_wide_bin_sys"),
        F.sort_array(F.collect_list("_sys")).alias("_syss"),
        F.avg("_sys.rad").alias("radian_mean"),
        F.stddev_pop("_sys.rad").alias("radian_std"),
    )
    arr = F.col("_syss")
    per_snap = per_snap.select(
        *group_cols,
        "n_wide_bin_sys",
        "n_defined_wide_bin_sys",
        F.to_json(F.transform(arr, lambda s: s.getField("names"))).alias("names"),
        F.to_json(F.transform(arr, lambda s: s.getField("dist_pc"))).alias("dist_pc"),
        F.to_json(
            F.transform(arr, lambda s: s.getField("dist_r_tidal"))
        ).alias("dist_r_tidal"),
        F.to_json(F.transform(arr, lambda s: s.getField("rad"))).alias("radian"),
        "radian_mean",
        "radian_std",
        F.to_json(
            F.transform(arr, lambda s: F.degrees(s.getField("rad")))
        ).alias("degree"),
        F.degrees(F.col("radian_mean")).alias("degree_mean"),
        F.degrees(F.col("radian_std")).alias("degree_std"),
    )
    # Headers are the base: snapshots with no qualifying wide system
    # still emit a row (n=0, empty JSON lists), matching the reference.
    hdr = assembled.snapshot_headers.select(*group_cols, "r_tidal")
    return hdr.join(per_snap, group_cols, "left").select(
        *group_cols,
        F.coalesce("n_wide_bin_sys", F.lit(0)).alias("n_wide_bin_sys"),
        F.coalesce("n_defined_wide_bin_sys", F.lit(0)).alias(
            "n_defined_wide_bin_sys"
        ),
        F.coalesce("names", F.lit("[]")).alias("names"),
        F.coalesce("dist_pc", F.lit("[]")).alias("dist_pc"),
        F.coalesce("dist_r_tidal", F.lit("[]")).alias("dist_r_tidal"),
        F.coalesce("radian", F.lit("[]")).alias("radian"),
        "radian_mean",
        "radian_std",
        F.coalesce("degree", F.lit("[]")).alias("degree"),
        "degree_mean",
        "degree_std",
        "r_tidal",
    )
