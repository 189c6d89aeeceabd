"""nbody6_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
(fengshun124/NBODY6-data-pipeline): block-structured text ingestion,
snapshot assembly, pseudo-observation, per-snapshot and cross-run
statistics, time-grid interpolation, stratified dataset splitting —
plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.

Design stance (SURVEY.md §7.0): no nested object tree — long
DataFrames keyed by ``(run_id, obs_x, obs_y, obs_z, time)``; a pure
column-expression function library; pipeline stages as
``DataFrame -> DataFrame`` transforms that Catalyst can optimize
end-to-end.
"""

from nbody6_data_pipeline_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
