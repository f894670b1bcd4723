package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** NOT NULL column invariants (Delta's column invariants) + the SQL
  * constraint DDL spellings. The semantic line vs CHECK constraints:
  * a CHECK passes NULL (the SQL constraint rule), NOT NULL is exactly
  * the rejection of it — including a staged frame that omits the
  * column entirely (its rows would read back NULL). */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-invariant").toString

  test("NOT NULL rejects what CHECK passes: NULL rows abort stageless") {
    val path = tmp
    TxLogTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    // the CHECK passes NULLs by the SQL rule…
    TxLogTable.addCheckConstraint(spark, path, "v_short", "length(v) < 10")
    val vNull: String = null
    TxLogTable.append(spark, Seq((3L, vNull)).toDF("id", "v"), path)
    assert(TxLogTable.read(spark, path).count() == 3)
    // …the NOT NULL invariant cannot even be ADDED now (existing NULL)
    val addErr = intercept[IllegalStateException] {
      TxLogTable.setNotNull(spark, path, "v")
    }
    assert(addErr.getMessage.contains("1 existing row"))
    TxLogTable.deleteWhere(spark, path, col("v").isNull)
    TxLogTable.setNotNull(spark, path, "v")
    assert(TxLogTable.notNullColumns(path) == Seq("v"))
    // a violating append aborts with NOTHING staged
    val v0 = TxLogTable.currentVersion(path)
    val err = intercept[IllegalStateException] {
      TxLogTable.append(spark, Seq((4L, vNull)).toDF("id", "v"), path)
    }
    assert(err.getMessage.contains("NOT NULL invariant on v"))
    assert(TxLogTable.currentVersion(path) == v0)
    val referenced = TxLogTable.allVersions(path)
      .flatMap(v => TxLogTable.filesAt(path, v))
      .map(_.split('/').head).toSet
    val onDisk = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data-"))
      .map(_.getName).toSet
    assert(onDisk.subsetOf(referenced), "violating append must stage nothing")
    // an append that OMITS the column refuses structurally (rows would
    // read back NULL with no aggregate able to see them)
    val omitErr = intercept[IllegalStateException] {
      TxLogTable.append(spark, Seq(Tuple1(5L)).toDF("id"), path)
    }
    assert(omitErr.getMessage.contains("omits NOT NULL column"))
    // dropping the invariant restores CHECK-only behavior
    TxLogTable.dropNotNull(path, "v")
    TxLogTable.append(spark, Seq((6L, vNull)).toDF("id", "v"), path)
  }

  test("NOT NULL gates UPDATE images; rename/drop of an invariant column refuses") {
    val path = tmp
    TxLogTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    TxLogTable.setNotNull(spark, path, "v")
    val err = intercept[IllegalStateException] {
      TxLogTable.updateWhere(spark, path,
        Map("v" -> lit(null)), col("id") === 1L)
    }
    assert(err.getMessage.contains("NOT NULL invariant"))
    assert(TxLogTable.read(spark, path)
      .filter(col("v").isNull).count() == 0)
    // column-mapping DDL refuses while the invariant stands
    val renameErr = intercept[IllegalArgumentException] {
      TxLogTable.renameColumn(spark, path, "v", "w")
    }
    assert(renameErr.getMessage.contains("NOT NULL invariant"))
    // clones carry the invariant
    val dest = tmp + "-clone"
    new java.io.File(dest).delete()
    TxLogTable.shallowClone(spark, path, dest)
    assert(TxLogTable.notNullColumns(dest) == Seq("v"))
  }

  test("SQL spellings: ADD/DROP CONSTRAINT, ALTER COLUMN SET/DROP NOT NULL") {
    val path = tmp
    TxLogTable.append(spark,
      Seq((1L, 5.0), (2L, 7.0)).toDF("id", "amt"), path)
    val t = s"graftlog.`$path`"
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    assert(TxLogTable.checkConstraints(path) == Map("amt_pos" -> "amt > 0"))
    val err = intercept[Exception] {
      TxLogTable.append(spark, Seq((3L, -1.0)).toDF("id", "amt"), path)
    }
    assert(err.getMessage.contains("amt_pos"))
    spark.sql(s"ALTER TABLE $t ALTER COLUMN amt SET NOT NULL")
    assert(TxLogTable.notNullColumns(path) == Seq("amt"))
    val nullErr = intercept[Exception] {
      TxLogTable.append(spark,
        Seq((4L, Option.empty[Double])).toDF("id", "amt"), path)
    }
    assert(nullErr.getMessage.contains("NOT NULL"))
    spark.sql(s"ALTER TABLE $t ALTER COLUMN amt DROP NOT NULL")
    assert(TxLogTable.notNullColumns(path).isEmpty)
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT amt_pos")
    assert(TxLogTable.checkConstraints(path).isEmpty)
    TxLogTable.append(spark,
      Seq((5L, Option.empty[Double])).toDF("id", "amt"), path)
    assert(TxLogTable.read(spark, path).count() == 3)
    // catalog-table spelling works too
    spark.sql("DROP TABLE IF EXISTS inv_ct")
    spark.sql(s"CREATE TABLE inv_ct USING graftlog OPTIONS (path '$path')")
    spark.sql("ALTER TABLE inv_ct ADD CONSTRAINT id_pos CHECK (id > 0)")
    assert(TxLogTable.checkConstraints(path).contains("id_pos"))
    spark.sql("ALTER TABLE inv_ct DROP CONSTRAINT id_pos")
    spark.sql("DROP TABLE inv_ct")
  }
}
