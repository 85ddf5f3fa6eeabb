"""strava_etl_public_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of ``sam-pitcher/strava-etl-public``:

- incremental watermark ingest           (reference main.py:187-197)
- normalization with defaulting          (reference strava_sdk.py:203-293)
- time-spine densification + linear
  interpolation of sensor gaps           (reference main.py:47-59)
- triangular-weighted rolling means over
  11 window sizes + per-activity maxima  (reference main.py:83-106)
- nested-record assembly                 (reference main.py:142-178)
- keyed last-writer-wins upserts         (reference firebase_functions.py:54-62)

plus LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing) designed partition-parallel for
100 TB scale: no driver-side collects in the data path, broadcast only
bounded dims, single sort shared across window families, AQE-friendly.
"""

__version__ = "0.1.0"
