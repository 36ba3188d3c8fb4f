"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``compae/SparkStreamingStateful``
(stream-processor category; reference tree empty — see SURVEY.md §0, so the
normative surface is SURVEY.md §2's operator inventory).

Architecture: idiomatic PySpark. Queries are declared with the DataFrame /
SQL API so Catalyst + Tungsten pick the physical strategy; Python (Arrow /
pandas UDF) appears only where built-in operators cannot express the
semantics (custom stateful streaming ops, a few LLM-pipeline kernels).
"""

__version__ = "0.1.0"
