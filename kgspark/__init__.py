"""kgspark — PySpark-native knowledge-graph construction + error detection.

A brand-new engine with the capabilities of the reference (aolimelo/kged,
PaTyBRED, K-CAP 2017) re-expressed Spark-first: DataFrame/SQL plans that
Catalyst optimizes, Arrow-batched pandas UDFs for mention detection and
model fitting, deterministic hash-based sampling (partition-invariant),
and explicit partition/skew handling designed for 1000-executor clusters.

Modules map to the operator inventory in SURVEY.md §2.
"""

__version__ = "0.1.0"
