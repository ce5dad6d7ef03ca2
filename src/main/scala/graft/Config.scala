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
    "pw" -> Entity("pw", "logs/pw", 0, "dd-contact-pw", "51130"),
    "wb" -> Entity("wb", "logs/wb", 1, "dd-contact-wb", "51310"))

  final class UnknownEntityException(name: String)
    extends IllegalArgumentException(s"unknown entity: $name")

  def forEntity(name: String): Entity =
    entities.getOrElse(name, throw new UnknownEntityException(name))

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
