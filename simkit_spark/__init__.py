"""simkit_spark — a from-scratch PySpark-native analytics engine with the
capabilities of Graphistics/simkit (spectral clustering over similarity
graphs), re-expressed as a knowledge-graph-construction pipeline on
DataFrames + Arrow/pandas UDFs.

Reference semantics are documented per-module with /root/reference
file:line citations; no reference code is copied (the reference is a
dense-matrix Java/Neo4j plugin; this engine is edge-list DataFrames
end to end).
"""

__version__ = "0.1.0"
