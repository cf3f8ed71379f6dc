package graft.sources

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.DictLookup

/** CH external-dictionary analog: a keyed attribute table loaded into RAM
  * once and consulted per row as a FUNCTION (`dictGet('nation', 'n_name',
  * key)`), not a join. The reference's ClickHouse deployments resolve
  * enum-like ids this way; here a [[Dictionary]] wraps per-attribute hash
  * tables behind [[graft.functions.DictLookup]], a codegen'd expression —
  * the query plan carries NO join node, no shuffle, and the probe stays
  * inside WholeStageCodegen.
  *
  * Scale contract (the honest part): every executor holds the whole
  * table, exactly like CH's hashed-layout dictionaries — so [[load]]
  * enforces `maxEntries` and refuses bigger inputs loudly, pointing at
  * [[Dictionary.joinGet]] (an explicit broadcast LEFT join) which is the
  * right plan once the lookup side stops being dictionary-sized. The
  * load itself is one bounded `collect()` — the same metadata-scale
  * driver traffic as a CH dictionary refresh.
  *
  * Semantics, pinned by DictionarySpec and the `o_x10_dictget` oracle:
  * NULL or absent key → NULL ([[Dictionary.get]]), caller default
  * ([[Dictionary.getOrDefault]]), false ([[Dictionary.has]]); duplicate
  * and NULL dictionary keys are load-time errors (CH hashed layout
  * rejects duplicates too — silently keeping one would be
  * nondeterministic).
  */
final class Dictionary private (
    val name: String,
    val keyType: DataType,
    attrs: Map[String, (DataType, JHashMap[Any, AnyRef])],
    present: JHashMap[Any, AnyRef]) extends Serializable {

  def attributes: Seq[String] = attrs.keys.toSeq.sorted
  def size: Int = present.size

  /** `dictGet`: attribute value for the key, NULL when absent. The key is
    * try_cast to the dictionary's key type: an INT column probes a
    * BIGINT-keyed table correctly, and a probe value that does not FIT
    * the key type (e.g. a BIGINT 2^32+5 against an INT-keyed table) is
    * simply absent → NULL — a plain cast would either fail the query
    * (ANSI, the Spark 4 default) or wrap to a false match. */
  def get(attr: String, key: Column): Column = {
    val (dt, table) = attrs.getOrElse(attr,
      throw new IllegalArgumentException(
        s"dictionary '$name' has no attribute '$attr' (has: ${attributes.mkString(", ")})"))
    Bridge.column(DictLookup(Bridge.expression(key.try_cast(keyType)), table, dt, name, attr))
  }

  /** `dictGetOrDefault`: the default replaces an absent (or NULL-keyed)
    * lookup. A stored NULL attribute value also yields the default —
    * same as CH, whose dictionary attributes are non-nullable. */
  def getOrDefault(attr: String, key: Column, default: Column): Column =
    coalesce(get(attr, key), default)

  /** `dictHas`: true iff the key is present (false for NULL keys). */
  def has(key: Column): Column =
    coalesce(
      Bridge.column(DictLookup(Bridge.expression(key.try_cast(keyType)), present,
        BooleanType, name, "__present")),
      lit(false))
}

object Dictionary {
  /** Load a dictionary from the first `maxEntries` rows of `df` — or fail
    * if there are more: silently truncating a lookup table would turn
    * absent-key semantics into data corruption. Keys must be unique and
    * non-NULL. Values are catalyst-converted once here so every per-row
    * probe is conversion-free. */
  def load(df: DataFrame, name: String, keyCol: String, attrCols: Seq[String],
           maxEntries: Int = 100000): Dictionary = {
    require(attrCols.nonEmpty, s"dictionary '$name': at least one attribute column")
    val prj = df.select((keyCol +: attrCols).map(col): _*)
    val schema = prj.schema
    val keyType = schema(keyCol).dataType
    val rows = prj.limit(maxEntries + 1).collect()
    if (rows.length > maxEntries)
      throw new IllegalArgumentException(
        s"dictionary '$name' exceeds maxEntries=$maxEntries — a dictionary is RAM-resident " +
          "on every executor by definition; for table-sized lookups use " +
          "Dictionary.joinGet (explicit broadcast join) instead")
    // Literal.create is the public door to the catalyst converters.
    def toCatalyst(v: Any, dt: DataType): AnyRef =
      Literal.create(v, dt).value.asInstanceOf[AnyRef]
    val attrTypes = attrCols.map(a => schema(a).dataType)
    val tables = attrCols.map(_ => new JHashMap[Any, AnyRef](rows.length * 2))
    val present = new JHashMap[Any, AnyRef](rows.length * 2)
    rows.foreach { r =>
      val kRaw = r.get(0)
      if (kRaw == null) throw new IllegalArgumentException(
        s"dictionary '$name': NULL key — a NULL can never be probed, so it can only hide rows")
      val k = toCatalyst(kRaw, keyType)
      if (present.put(k, java.lang.Boolean.TRUE) != null)
        throw new IllegalArgumentException(
          s"dictionary '$name': duplicate key '$kRaw' — keys must be unique " +
            "(silently keeping one copy would be nondeterministic)")
      var i = 0
      while (i < attrCols.length) {
        val v = r.get(i + 1)
        if (v != null) tables(i).put(k, toCatalyst(v, attrTypes(i)))
        i += 1
      }
    }
    new Dictionary(name, keyType,
      attrCols.zipWithIndex.map { case (a, i) => a -> ((attrTypes(i), tables(i))) }.toMap,
      present)
  }

  /** The beyond-dictionary-size path: same row semantics as per-attr
    * [[Dictionary.get]] (LEFT join keeps unmatched rows with NULL attrs),
    * as an explicit broadcast hash join. */
  def joinGet(df: DataFrame, dictDf: DataFrame, key: Column, keyCol: String,
              attrCols: Seq[String]): DataFrame = {
    val d = dictDf.select((keyCol +: attrCols).map(col): _*)
    df.join(broadcast(d), key === d(keyCol), "left").drop(d(keyCol))
  }
}
