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
    valid = F.when(F.col("inclination_rad").isNotNull(), F.col("inclination_rad"))
    per_snap = sys_df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_wide_bin_sys"),
        F.count(valid).cast("int").alias("n_defined_wide_bin_sys"),
        F.to_json(F.collect_list("names")).alias("names"),
        F.to_json(F.collect_list("dist_pc")).alias("dist_pc"),
        F.to_json(F.collect_list("dist_r_tidal")).alias("dist_r_tidal"),
        F.to_json(F.collect_list("inclination_rad")).alias("radian"),
        F.avg(valid).alias("radian_mean"),
        F.stddev_pop(valid).alias("radian_std"),
        F.to_json(
            F.collect_list(F.degrees("inclination_rad"))
        ).alias("degree"),
        F.degrees(F.avg(valid)).alias("degree_mean"),
        F.degrees(F.stddev_pop(valid)).alias("degree_std"),
    )
    hdr = assembled.snapshot_headers.select(*group_cols, "r_tidal")
    return per_snap.join(hdr, group_cols, "left")
