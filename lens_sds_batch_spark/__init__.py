"""lens_sds_batch_spark — a PySpark-native engine with the query and
data-processing capabilities of ``alexanderkiel/lens-sds-batch``.

The reference (read-only at /root/reference) is a Clojure CQRS batch
processor that walks CDISC-ODM clinical-data trees node-at-a-time over an
AMQP bus.  This engine re-expresses those capabilities *level-at-a-time*
as Spark DataFrame pipelines (see SURVEY.md §1.3, §3.1), plus the
relational and LLM-data-pipeline operator surface (SURVEY.md §2 Table B)
required for a complete engine at 100 TB design scale.

Layout:
  functions/   deterministic key expressions (UUIDv5/v3), text & vector fns
  sources/     table loaders, ODM-XML ingestion, streaming sources
  plans/       the ODM dataflow: normalize, tx-resolution, commands,
               merge (LWW upsert application), correlation
  operators/   relational inventory, dedup, similarity, text, multimodal
  streaming/   Structured Streaming flavor of the command pipeline
"""

__version__ = "0.1.0"
