"""databox_adls_loader_spark — a PySpark-native engine with the query and
data-processing capabilities of ``Azure/databox-adls-loader``.

The reference (read-only at ``/root/reference``) is an HDFS→Data Box→ADLS Gen2
migration toolkit whose scripts compute a real dataflow: inventory scans,
directory-size rollups, capacity bin-packing, multi-line ACL parsing, identity
remap joins, and tolerant parallel sinks.  This package re-expresses every one
of those operators Spark-first (DataFrame/SQL/Catalyst) per SURVEY.md §2, and
adds the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) the reference lacks.

Layout:
    session      SparkSession factory tuned for the test/bench harness
    schemas      explicit StructTypes for every record type (SURVEY §1.1)
    fixtures     deterministic migration-domain fixture data (FIXTURES.md §A)
    sources/     S1-S9 scans & parsers
    operators/   P/F/J/A/O/X relational operators + extension ops
    functions/   scalar-function surface (§2.9)
    sinks/       K1-K7 writers & tolerant REST-style sink harness
    plans/       §3 end-to-end pipelines + the queries()/oracle_sql() registry
    streaming/   Structured-Streaming variant (§2.10 / §7 phase 6)
"""

__version__ = "0.1.0"
