package graft.operators

import graft.Q
import graft.sources.RestSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.1 API-shaped sources: the REST lookup source (canned
  * transport, real parsing/pushdown plumbing) and the JSON token/config
  * read. Oracles are literal SELECTs — the payloads are deterministic
  * connector fixtures, not parquet data.
  */
object Api {

  private val TokenJson =
    """{"id_token":"idt-1","access_token":"acc-1","expires_at":1767225600,
      |"token_type":"Bearer","refresh_token":"ref-1"}""".stripMargin
      .replace("\n", "")

  private val TokenSchema = StructType(Seq(
    StructField("id_token", StringType),
    StructField("access_token", StringType),
    StructField("expires_at", LongType),
    StructField("token_type", StringType),
    StructField("refresh_token", StringType)))

  val queries: Seq[Q] = Seq(

    // REST source with pushed filter (= query-param construction,
    // /root/reference/src/apiFunctions.ts:130-147): canned server, real
    // where-string build + from_json/explode parse.
    Q("src_api_lookup",
      (1 to 3).map(i =>
        s"""SELECT 'inv-2024-01-15-$i' AS invoiceID, '2024-01-15' AS dateString,
           |'DD/$i' AS reference, 'SUBMITTED' AS status,
           |CAST($i${"00"}.25 AS DOUBLE) AS total""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY invoiceID")) { (s, _) =>
      RestSource.fetchInvoices(s, RestSource.cannedServer,
        "Day Dockets", "2024-01-15")
        .orderBy("invoiceID")
    },

    // JSON token/config read with required-field validation
    // (/root/reference/src/helpers.ts:128-151: token set must carry 5
    // fields).
    Q("src_json_token",
      """SELECT 'acc-1' AS access_token, 'Bearer' AS token_type,
        |CAST(1767225600 AS BIGINT) AS expires_at, TRUE AS is_valid""".stripMargin) {
      (s, _) =>
        import s.implicits._
        Seq(TokenJson).toDF("body")
          .select(from_json(col("body"), TokenSchema).as("t"))
          .select(col("t.access_token").as("access_token"),
            col("t.token_type").as("token_type"),
            col("t.expires_at").as("expires_at"),
            (col("t.id_token").isNotNull && col("t.access_token").isNotNull
              && col("t.expires_at").isNotNull && col("t.token_type").isNotNull
              && col("t.refresh_token").isNotNull).as("is_valid"))
    }
  )
}
