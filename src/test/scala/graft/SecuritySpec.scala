package graft

import graft.operators.{Panels, Security}
import org.apache.spark.sql.functions._

/** The masked-view security contract: row filter and column mask are
  * properties of the FRAME a spoke receives, so no composition over it
  * can leak another site's rows or a raw identifier.
  */
class SecuritySpec extends SparkSpec {

  private val siteA = 2L
  private val siteB = 17L // both non-empty at sf0.001

  test("siteView: row security — only the site's patients' facts") {
    val members = Tables.customer(spark, sfDir)
      .filter(col("c_nationkey") === siteA)
      .select(col("c_custkey").as("user_id"))
    val raw = Tables.events(spark, sfDir)
      .join(members, Seq("user_id"), "left_semi")
    val view = Security.siteView(spark, sfDir, siteA)
    assert(view.count() === raw.count())
    // every pseudonym in the view derives from a site member — the
    // view's key set equals the masked key set of the raw site slice
    val masked = raw.select(md5(concat(lit(s"site_$siteA:"),
      col("user_id").cast("string")).cast("binary")).as("user_id"))
    assert(view.select("user_id").except(masked).count() === 0)
  }

  test("siteView: column mask — no raw identifier or payload survives") {
    val view = Security.siteView(spark, sfDir, siteA)
    // pseudonyms only: every user_id is a 32-hex md5, no raw numeric id
    assert(view.filter(!col("user_id").rlike("^[0-9a-f]{32}$")).count() === 0)
    // payload redacted
    assert(view.filter(col("props").isNotNull).count() === 0)
  }

  test("siteView: pseudonyms are unlinkable across sites") {
    val a = Security.siteView(spark, sfDir, siteA).select("user_id")
    val b = Security.siteView(spark, sfDir, siteB).select("user_id")
    assert(a.intersect(b).count() === 0)
  }

  test("panel compile commutes with the mask (no leak through any composition)") {
    // cohort over the view == pseudonymized cohort over the raw slice:
    // a registered query running on the masked frame returns exactly
    // the rows the site's own slice justifies, nothing more
    val overView = Panels.cohort(
      Security.siteView(spark, sfDir, siteA), Security.secDef)
      .orderBy("user_id").collect().toSeq
    val members = Tables.customer(spark, sfDir)
      .filter(col("c_nationkey") === siteA)
      .select(col("c_custkey").as("user_id"))
    val overRaw = Panels.cohort(
      Tables.events(spark, sfDir).join(members, Seq("user_id"), "left_semi"),
      Security.secDef)
      .select(md5(concat(lit(s"site_$siteA:"),
        col("user_id").cast("string")).cast("binary")).as("user_id"),
        col("p0"))
      .orderBy("user_id").collect().toSeq
    assert(overView.nonEmpty && overView === overRaw)
    // and a DIFFERENT composition (attrition ladder) stays site-bounded:
    // its step-0 population equals the site's patient count, not the
    // corpus's
    val ladder = Panels.attrition(
      Security.siteView(spark, sfDir, siteA), Security.secDef)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val sitePatients = Security.siteView(spark, sfDir, siteA)
      .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-01-08").cast("timestamp"))
      .select("user_id").distinct().count()
    assert(ladder(0) === sitePatients)
  }
}
