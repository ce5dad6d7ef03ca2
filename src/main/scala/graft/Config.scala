package graft

/** Entity → runtime-config dispatch (SURVEY §2.9 `chk_config`;
  * /root/reference/src/helpers.ts:20-46, src/server.ts:7,
  * src/DataObject.ts:144,183): log path, tenant index, DD contact id and
  * store-expense GL code per entity, invalid entity ⇒ throw. Driver-side
  * control plane — deliberately NOT a DataFrame.
  */
object Config {

  final case class Entity(name: String, logPath: String, tenantIndex: Int,
      ddContactId: String, storeExpenseGl: String)

  private val entities = Map(
    "pw" -> Entity("pw", "logs/pw", 1, "dd-contact-pw", "51130"),
    "wb" -> Entity("wb", "logs/wb", 0, "dd-contact-wb", "51310"))

  /** The reference's exact invalid-entity message
    * (/root/reference/src/helpers.ts:28,32). */
  val InvalidEntityMsg =
    "Invalid or null entity value provided or environment variable has not been set"

  final class UnknownEntityException(name: String)
    extends IllegalArgumentException(s"$InvalidEntityMsg: $name")

  def forEntity(name: String): Entity =
    entities.getOrElse(name, throw new UnknownEntityException(name))

  /** The entity→config dispatch as a DATA-PLANE dimension (SURVEY §2.9
    * chk_config as an oracled query, VERDICT r6 #5): tiny ⇒ always
    * broadcast on the probe side. Column names are the join contract
    * with `chk_config`'s oracle SQL. */
  def dim(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    entities.values.toSeq.sortBy(_.name)
      .map(e => (e.name, e.logPath, e.tenantIndex, e.ddContactId, e.storeExpenseGl))
      .toDF("entity", "logPath", "tenantIndex", "ddContactId", "storeExpenseGl")
  }

  /** Strict dispatch gate — the data-plane analog of the reference's
    * throw on an unknown entity: any request entity absent from the
    * config dimension aborts the batch (cheap: anti-join against a
    * broadcast 2-row dim, `limit 1` probe). */
  def requireAllKnown(requests: org.apache.spark.sql.DataFrame): Unit = {
    val bad = requests.select("entity").distinct()
      .join(org.apache.spark.sql.functions.broadcast(
        dim(requests.sparkSession)), Seq("entity"), "left_anti")
      .limit(1).collect()
    if (bad.nonEmpty) throw new UnknownEntityException(bad.head.getString(0))
  }

  final class NoTenantsException
    extends IllegalStateException("Tenant array received from API is empty")

  /** Active-tenant selection (/root/reference/src/apiFunctions.ts:36-48):
    * the entity's tenantIndex picks from the connections list; an empty
    * list is a hard error. */
  def activeTenant(entity: String, tenantIds: Seq[String]): String = {
    if (tenantIds.isEmpty) throw new NoTenantsException
    tenantIds(forEntity(entity).tenantIndex)
  }
}
