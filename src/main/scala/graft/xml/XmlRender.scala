package graft.xml

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Per-key wrapper-element rules + formatting policy for the product XML
  * serializer (reference `src/s3_json_to_xml.py:158-221`).
  *
  * @param wrappers  array-field name → wrapper element name; arrays not in
  *                  the map render their items unwrapped
  *                  (reference `:176-183` vs `:195-201`)
  * @param escape    the reference never XML-escapes (`&`/`<` pass through
  *                  raw — a latent reference bug, SURVEY §7.4). Default
  *                  `false` for byte parity; `true` gives the fixed engine.
  */
case class XmlRules(wrappers: Map[String, String], escape: Boolean = false) {
  def escaped(s: String): String =
    if (!escape) s
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}

object XmlRules {
  /** The reference's rules: `src/s3_json_to_xml.py:176-183`. */
  val reference: XmlRules = XmlRules(Map(
    "countryOfOrigin" -> "entry",
    "itemSellingPrices" -> "price",
    "itemGrossPrices" -> "price",
    "fabricCompositions" -> "composition"))
}

/** Row → XML fragment renderer (operator X1, SURVEY §2.5).
  *
  * A pure Scala function applied with `Dataset.map` / a UDF — fully
  * distributed, one product per row, no driver involvement. Semantics are
  * byte-parity with the reference's `_to_xml_product`
  * (`src/s3_json_to_xml.py:158-221`):
  *
  *   - fields render in struct-field order (= document key order when the
  *     schema is the explicit document-order StructType, FIXTURES.md §2);
  *   - `null` fields are omitted (the reference iterates only present keys);
  *   - array fields: open/close element named by the key, items wrapped per
  *     [[XmlRules.wrappers]]; struct items expand ONE level, each sub-value
  *     stringified; non-struct items render as bare indented text;
  *   - struct fields expand one level, sub-values stringified;
  *   - scalars render `<k>v</k>` with Python-`str()`-style formatting
  *     ([[XmlRender.pystr]]): doubles shortest-round-trip with a trailing
  *     `.0` for integral values, booleans `True`/`False`;
  *   - two-space indentation relative to the passed padding;
  *   - no XML escaping unless [[XmlRules.escape]].
  */
object XmlRender {

  /** Python `str()` parity for the scalar types a JSON document can carry.
    * Java's `Double.toString` agrees with CPython's shortest-round-trip
    * repr on the positional range BOTH engines print positionally — but
    * the two switch to scientific notation at different magnitudes (Java
    * at >= 1e7 and < 1e-3, CPython at >= 1e16 and < 1e-4), so Java's
    * exponent form is re-expanded to positional digits inside
    * [1e-4, 1e16) and normalized to Python's `e+NN`/`e-NN` style outside.
    */
  def pystr(v: Any): String = v match {
    case null => "None"
    case b: Boolean => if (b) "True" else "False"
    case d: Double => pyDouble(d)
    case f: Float => pyDouble(f.toDouble)
    case d: java.math.BigDecimal => pyDouble(d.doubleValue())
    case other => other.toString
  }

  private def pyDouble(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    val s = java.lang.Double.toString(d)
    if (!s.contains("E")) s
    else {
      val a = math.abs(d)
      if (a >= 1e-4 && a < 1e16) {
        // Java went scientific where Python stays positional: rebuild the
        // positional form from the same shortest-round-trip digits
        val plain = new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
        if (plain.contains('.')) plain else plain + ".0"
      } else { // 1.1E22 → 1.1e+22, 1.0E-7 → 1e-07 (Python style)
        val Array(m, e) = s.split("E")
        val exp = e.toInt
        val mantissa = if (m.endsWith(".0")) m.dropRight(2) else m
        val sign = if (exp < 0) "-" else "+"
        f"${mantissa}e$sign${math.abs(exp)}%02d"
      }
    }
  }

  /** Render one product row (fields at `padding`, children indented two
    * spaces per level). Mirrors `_to_xml_product(product, line_padding)`.
    */
  def renderProduct(row: Row, padding: String = "    ",
                    rules: XmlRules = XmlRules.reference): String = {
    val sb = new StringBuilder
    val schema = row.schema
    var i = 0
    while (i < schema.length) {
      val field = schema(i)
      if (!row.isNullAt(i)) {
        field.dataType match {
          case _: ArrayType =>
            sb.append(s"$padding<${field.name}>\n")
            val items = row.getSeq[Any](i)
            val wrapper = rules.wrappers.get(field.name)
            items.foreach { item =>
              wrapper match {
                case Some(w) =>
                  sb.append(s"$padding  <$w>\n")
                  item match {
                    case r: Row => appendStructFields(sb, r, s"$padding    ", rules)
                    case other => sb.append(s"$padding    ${rules.escaped(pystr(other))}\n")
                  }
                  sb.append(s"$padding  </$w>\n")
                case None =>
                  item match {
                    case r: Row => appendStructFields(sb, r, s"$padding  ", rules)
                    case other => sb.append(s"$padding  ${rules.escaped(pystr(other))}\n")
                  }
              }
            }
            sb.append(s"$padding</${field.name}>\n")
          case _: StructType =>
            sb.append(s"$padding<${field.name}>\n")
            appendStructFields(sb, row.getStruct(i), s"$padding  ", rules)
            sb.append(s"$padding</${field.name}>\n")
          case _ =>
            val v = rules.escaped(pystr(row.get(i)))
            sb.append(s"$padding<${field.name}>$v</${field.name}>\n")
        }
      }
      i += 1
    }
    sb.toString
  }

  /** One-level struct expansion: `<subKey>str(subValue)</subKey>` per field
    * (reference `:204-208` — sub-values are stringified, never recursed).
    */
  private def appendStructFields(sb: StringBuilder, r: Row, pad: String,
                                 rules: XmlRules): Unit = {
    val s = r.schema
    var j = 0
    while (j < s.length) {
      if (!r.isNullAt(j))
        sb.append(s"$pad<${s(j).name}>${rules.escaped(pystr(r.get(j)))}</${s(j).name}>\n")
      j += 1
    }
  }
}
