"""Streaming flavor of the flagship: batch-commands arrive as a stream
(reference A4 — one ODM file per batch command), each micro-batch runs
the command pipeline via foreachBatch, and the union of streamed
outputs equals the batch run (deterministic ids ⇒ stream/batch
equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_sds_batch_spark.plans.commands import generate_commands
from lens_sds_batch_spark.sources.odm_xml import PARSED_SCHEMA, odm_tables_from_xml, read_odm_xml

XML_A = """<ODM FileOID="F-S1">
  <ClinicalData StudyOID="S1">
    <SubjectData SubjectKey="SK01" TransactionType="Insert">
      <StudyEventData StudyEventOID="SE1">
        <FormData FormOID="FM1">
          <ItemGroupData ItemGroupOID="IG1">
            <ItemDataString ItemOID="I1">a</ItemDataString>
            <ItemDataInteger ItemOID="I2">7</ItemDataInteger>
          </ItemGroupData>
        </FormData>
      </StudyEventData>
    </SubjectData>
  </ClinicalData>
</ODM>
"""

XML_B = """<ODM FileOID="F-S2">
  <ClinicalData StudyOID="S2">
    <SubjectData SubjectKey="SK09" TransactionType="Upsert">
      <StudyEventData StudyEventOID="SE9" TransactionType="Remove"/>
    </SubjectData>
    <SubjectData SubjectKey="SK10" TransactionType="Remove"/>
  </ClinicalData>
</ODM>
"""

META = {
    "F-S1": ("00000000-0000-0000-0000-00000000b001", "stream-importer"),
    "F-S2": ("00000000-0000-0000-0000-00000000b002", "stream-importer"),
}


def _meta_df(spark, file_oid):
    bcid, sub = META[file_oid]
    return spark.createDataFrame(
        [(file_oid, "transactional", bcid, sub)],
        "file_oid string, file_type string, batch_cmd_id string, sub string",
    )


def _commands_for_file(spark, parsed_one_file):
    file_oid = parsed_one_file.select("file_oid").first()[0]
    bcid, sub = META[file_oid]
    odm = odm_tables_from_xml(parsed_one_file, _meta_df(spark, file_oid))
    return generate_commands(odm, bcid, sub, persist=False)


def test_streamed_commands_equal_batch(spark, tmp_path):
    # two ODM files -> parse -> one parquet file per ODM file (the
    # stream delivery unit, like one AMQP batch command each)
    xml_dir = tmp_path / "xml"
    xml_dir.mkdir()
    (xml_dir / "a.xml").write_text(XML_A)
    (xml_dir / "b.xml").write_text(XML_B)
    parsed = read_odm_xml(spark, str(xml_dir))
    src = tmp_path / "parsed_stream"
    for f in ("F-S1", "F-S2"):
        parsed.where(F.col("file_oid") == f).coalesce(1).write.mode("append").parquet(str(src))

    out = str(tmp_path / "commands_out")

    def process(batch_df, epoch_id):
        for row in batch_df.select("file_oid").distinct().collect():
            one = batch_df.where(F.col("file_oid") == row[0])
            _commands_for_file(one.sparkSession, one).write.mode("append").parquet(out)

    stream = (
        spark.readStream.schema(PARSED_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(process).start()
    q.processAllAvailable()
    q.stop()

    streamed = spark.read.parquet(out)
    batch = _commands_for_file(spark, parsed.where(F.col("file_oid") == "F-S1")).unionByName(
        _commands_for_file(spark, parsed.where(F.col("file_oid") == "F-S2"))
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # the remove-subject for SK10 and remove-study-event (upsert parent)
    names = {r["name"] for r in streamed.collect()}
    assert "odm-import/remove-subject" in names
    assert "odm-import/remove-study-event" in names
    assert "odm-import/upsert-subject" in names


def test_multifile_micro_batch_single_pass(spark, tmp_path):
    """A multi-file micro-batch processed in ONE generate_commands pass
    (batch_cmd_id_map + sub Column) must equal the per-file driver-loop
    form — the loop is the collect-and-iterate shape that doesn't scale
    when a trigger delivers many batch commands at once."""
    from lens_sds_batch_spark.plans.commands import batch_cmd_id_map
    from lens_sds_batch_spark.sources.odm_xml import odm_tables_from_xml

    xml_dir = tmp_path / "xml1p"
    xml_dir.mkdir()
    (xml_dir / "a.xml").write_text(XML_A)
    (xml_dir / "b.xml").write_text(XML_B)
    parsed = read_odm_xml(spark, str(xml_dir))

    # per-file loop form (the existing streaming shape)
    looped = _commands_for_file(spark, parsed.where(F.col("file_oid") == "F-S1")).unionByName(
        _commands_for_file(spark, parsed.where(F.col("file_oid") == "F-S2"))
    )

    # one-pass form: both files through a single pipeline, namespaces
    # and submitter resolved per row from the queue metadata
    meta_df = spark.createDataFrame(
        [(f, "transactional", META[f][0], META[f][1]) for f in ("F-S1", "F-S2")],
        "file_oid string, file_type string, batch_cmd_id string, sub string",
    )
    odm = odm_tables_from_xml(parsed, meta_df)
    bcid_col = batch_cmd_id_map({f: META[f][0] for f in META})
    sub_col = F.element_at(
        F.create_map(*[F.lit(x) for f in META for x in (f, META[f][1])]),
        F.col("file_oid"),
    )
    one_pass = generate_commands(odm, bcid_col, sub_col, persist=False)

    assert one_pass.count() == looped.count()
    assert one_pass.exceptAll(looped).count() == 0
    assert looped.exceptAll(one_pass).count() == 0
