package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.KeyedParquetStore

/** Additive schema evolution on the CDC target store: a batch may
  * carry columns the store has never seen (source ALTER TABLE ADD) or
  * omit stored columns; old files are never rewritten. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a widening batch adds the column; untouched buckets read as null") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo").toString, nBuckets = 4)
    store.snapshot(spark, "t",
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"), "id")

    // batch touches ONE key, with a brand-new column w
    val changes = Seq(("U", 7L, "v7b", 77L)).toDF("op", "id", "v", "w")
    store.merge(spark, "t", changes, "id")

    val out = store.read(spark, "t")
    assert(out.columns.toSeq == Seq("id", "v", "w"))
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows.size == 20)
    assert(rows(7L) == ("v7b", Some(77L)))
    // a key in a bucket the batch never touched: null-filled, not rewritten
    assert(rows.collect { case (k, (_, w)) if k != 7L => w }.forall(_.isEmpty))
  }

  test("a narrower batch null-fills omitted stored columns") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo2").toString, nBuckets = 2)
    store.snapshot(spark, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    store.merge(spark, "t", Seq(("I", 3L)).toDF("op", "id"), "id")
    val rows = store.read(spark, "t").orderBy("id")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None))
  }

  test("type changes are rejected loudly") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo3").toString, nBuckets = 2)
    store.snapshot(spark, "t", Seq((1L, "a")).toDF("id", "v"), "id")
    val bad = Seq(("U", 1L, 42)).toDF("op", "id", "v") // v: string -> int
    val e = intercept[IllegalArgumentException] {
      store.merge(spark, "t", bad, "id")
    }
    assert(e.getMessage.contains("schema evolution"), e.getMessage)
  }

  test("DropPolicy.Error rejects a batch that omits stored columns, naming them") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo5").toString, nBuckets = 2)
    store.snapshot(spark, "t", Seq((1L, "a", 9L)).toDF("id", "v", "w"), "id")
    val e = intercept[IllegalArgumentException] {
      store.merge(spark, "t", Seq(("I", 2L, "b")).toDF("op", "id", "v"), "id",
        KeyedParquetStore.DropPolicy.Error)
    }
    assert(e.getMessage.contains("w") && e.getMessage.contains("resync"), e.getMessage)
    // the rejected merge left the store untouched and mergeable
    store.merge(spark, "t", Seq(("I", 2L, "b", 8L)).toDF("op", "id", "v", "w"), "id",
      KeyedParquetStore.DropPolicy.Error)
    assert(store.read(spark, "t").count() == 2)
  }

  test("retype error names the resync path; resync replaces schema and data wholesale") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo6").toString, nBuckets = 2)
    store.snapshot(spark, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    val bad = Seq(("U", 1L, 42)).toDF("op", "id", "v") // v: string -> int
    val e = intercept[IllegalArgumentException] {
      store.merge(spark, "t", bad, "id")
    }
    assert(e.getMessage.contains("resync"), e.getMessage)
    // operator answer to non-additive DDL: re-snapshot with the new shape
    store.resync(spark, "t", Seq((1L, 42), (2L, 43)).toDF("id", "v"), "id")
    assert(store.schemaOf(spark, "t")("v").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = store.read(spark, "t").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 42), (2L, 43)))
    // stream resumes post-resync: a normal merge applies cleanly
    store.merge(spark, "t", Seq(("U", 2L, 44)).toDF("op", "id", "v"), "id")
    assert(store.read(spark, "t").filter(col("id") === 2L)
      .collect().head.getInt(1) == 44)
  }

  test("TYPE WIDENING (int -> long) is non-additive too: rejected loudly " +
    "naming resync, never silently coerced; resync recovers") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo7").toString, nBuckets = 2)
    store.snapshot(spark, "t",
      Seq((1L, 7), (2L, 8)).toDF("id", "n"), "id") // n: int
    // source widened n to BIGINT — even a LOSSLESS widening must not
    // merge silently: stored parquet files carry int32 pages, and a
    // sidecar promising int64 would make every old file unreadable
    // under the declared schema. The declared policy is detect + fail
    // loudly + resync (the reference workflow's answer to DDL).
    val widened = Seq(("U", 1L, 7000000000L)).toDF("op", "id", "n")
    val e = intercept[IllegalArgumentException] {
      store.merge(spark, "t", widened, "id")
    }
    assert(e.getMessage.contains("int") && e.getMessage.contains("bigint") &&
      e.getMessage.contains("resync"), e.getMessage)
    // the rejected merge left the store readable and intact
    assert(store.read(spark, "t").count() == 2L)
    store.resync(spark, "t",
      Seq((1L, 7000000000L), (2L, 8L)).toDF("id", "n"), "id")
    assert(store.schemaOf(spark, "t")("n").dataType ==
      org.apache.spark.sql.types.LongType)
    store.merge(spark, "t", Seq(("I", 3L, 9L)).toDF("op", "id", "n"), "id")
    assert(store.read(spark, "t").count() == 3L)
  }

  test("COLUMN RENAME under DropPolicy.Error is caught as the drop it " +
    "looks like (old name absent), naming the column") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo8").toString, nBuckets = 2)
    store.snapshot(spark, "t", Seq((1L, "a")).toDF("id", "v"), "id")
    // source renamed v -> val: the batch omits v and carries val — on
    // the CDC path a rename is indistinguishable from drop(v)+add(val),
    // and the declared policy is the drop policy's: reject loudly
    // (Error) or null-fill v and append val (KeepNullFill), never a
    // silent value migration between the two names
    val renamed = Seq(("U", 1L, "a2")).toDF("op", "id", "val")
    val e = intercept[IllegalArgumentException] {
      store.merge(spark, "t", renamed, "id",
        KeyedParquetStore.DropPolicy.Error)
    }
    assert(e.getMessage.contains("v") && e.getMessage.contains("resync"),
      e.getMessage)
    store.resync(spark, "t", Seq((1L, "a")).toDF("id", "val"), "id")
    assert(store.schemaOf(spark, "t").fieldNames.toSeq == Seq("id", "val"))
  }

  test("widening then further merges keeps the widened schema") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo4").toString, nBuckets = 2)
    store.snapshot(spark, "t", Seq((1L, "a")).toDF("id", "v"), "id")
    store.merge(spark, "t", Seq(("I", 2L, "b", 9L)).toDF("op", "id", "v", "w"), "id")
    // an old-shape batch after widening: w survives as a stored column
    store.merge(spark, "t", Seq(("U", 1L, "a2")).toDF("op", "id", "v"), "id")
    val out = store.read(spark, "t").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getString(1) == "a2" && out(0).isNullAt(2))
    assert(out(1).getLong(2) == 9L)
    assert(store.schemaOf(spark, "t").fieldNames.toSeq == Seq("id", "v", "w"))
  }

  test("additive evolution under SOFT-DELETE mode: a new source column joins " +
    "BEFORE the meta columns and old tombstones null-fill") {
    import spark.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.types._
    import graft.streaming.{CdcPipeline, ChangeEvent}
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    val store = new KeyedParquetStore(
      Files.createTempDirectory("evo_soft").toString, nBuckets = 2)
    val v1 = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    CdcPipeline.snapshotSoft(spark, store,
      Map("t" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      Map("t" -> "id"))
    // soft-delete key 2 under the v1 schema
    CdcPipeline.applyBatchSoft(
      Seq(ChangeEvent(10, ts(10), "D", "t", 2, null)).toDF(),
      store, Map("t" -> v1), Map("t" -> "id"))

    // the source adds a column: later batches parse with the WIDER
    // schema; the stored meta columns and the old tombstone must both
    // survive the union-by-name merge
    val v2 = StructType(v1.fields :+ StructField("w", LongType))
    CdcPipeline.applyBatchSoft(
      Seq(ChangeEvent(11, ts(11), "U", "t", 1,
        """{"id":1,"v":"a2","w":7}""")).toDF(),
      store, Map("t" -> v2), Map("t" -> "id"))

    val out = store.read(spark, "t").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val cols = store.read(spark, "t").columns.toSeq
    assert(cols == Seq("id", "v",
      CdcPipeline.SoftDeleteCol, CdcPipeline.SyncedLsnCol, "w"),
      s"got $cols")
    // key 1: live, updated, carries the new column
    assert(out(0).getString(1) == "a2" &&
      !out(0).getBoolean(2) && out(0).getLong(3) == 11L &&
      out(0).getLong(4) == 7L)
    // key 2: the pre-evolution tombstone keeps flag+image, w null-fills
    assert(out(1).getString(1) == "b" &&
      out(1).getBoolean(2) && out(1).getLong(3) == 10L && out(1).isNullAt(4))
  }
}
