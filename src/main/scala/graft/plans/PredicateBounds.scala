package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftext.GraftBridge
import org.apache.spark.sql.graftext.GraftBridge.{Attr, Fn, Lit, PredNode}
import org.apache.spark.sql.types._

import SnapshotTable.FileEntry

/** Derive manifest data-skipping bounds from a DML predicate — the
  * Delta/Iceberg behavior where `DELETE WHERE date_col < X` prunes on
  * file stats WITHOUT the caller hand-writing a bounds box. Purely
  * syntactic over the predicate's unresolved node tree
  * ([[GraftBridge.predTree]] — no analysis, no session needed), and
  * strictly CONSERVATIVE: a bound is emitted only when
  * `predicate(row) = TRUE` provably implies the row lies inside it,
  * so pruning a non-overlapping file can never lose a matching row.
  * Anything the walk does not understand (OR, NOT, UDFs, casts,
  * arithmetic) contributes no constraint — pruning degrades to none,
  * never to wrong.
  *
  * Emitted constraints:
  *  - `AND` — both sides' constraints (a TRUE conjunction implies
  *    each conjunct; repeated columns become multiple boxes, which
  *    [[SnapshotTable.candidatesOf]] intersects).
  *  - `=`, `<=>` vs a literal — the point box `[v, v]`.
  *  - `<`, `<=`, `>`, `>=` vs a literal — a half-open box closed with
  *    a type-family sentinel (integral `Long.{Min,Max}Value`,
  *    floating `±Infinity`, datetime `Micros(Long.{Min,Max}Value)`,
  *    decimal `±1E+39` (beyond any precision-38 value), string `""`
  *    for the low end; an upper-open STRING bound is dropped — no
  *    finite max string).
  *  - `IN (v1…vn)` — the hull `[min v, max v]`.
  *
  * Literal families match [[SnapshotTable.FileEntry.enc]]'s stat tag
  * families exactly: integral `L`, floating `D`, string `S`,
  * date/timestamp `T` (internal days/micros canonicalized to
  * [[FileEntry.Micros]]), decimal `C`. */
object PredicateBounds {

  def derive(predicate: Column): Seq[(String, Any, Any)] =
    walk(GraftBridge.predTree(predicate))

  /** [[derive]] restricted by the TABLE SCHEMA: a bound survives only
    * when its column's declared type is in the same stat family as
    * the literal. This is the second fence against unit mismatches —
    * e.g. an integral literal compared against a DECIMAL column: the
    * comparison is legal SQL, but any L:-tagged stats for that column
    * (written by an old engine version from parquet's UNSCALED ints)
    * are in different units, and pruning on them would silently skip
    * matching rows. No schema → no derived pruning. */
  def deriveFor(predicate: Column,
                schema: Option[StructType]): Seq[(String, Any, Any)] =
    schema.fold(Seq.empty[(String, Any, Any)]) { st =>
      val fams = st.fields.iterator
        .map(f => f.name.toLowerCase -> familyOf(f.dataType)).toMap
      derive(predicate).filter { case (c, lo, _) =>
        fams.getOrElse(c.toLowerCase, None).contains(famOf(lo))
      }
    }

  /** The stat tag family a column of `dt` writes — None for every
    * type the manifest never tags (binary/interval/nested/…). */
  private def familyOf(dt: DataType): Option[Char] = dt match {
    case IntegerType | LongType | ShortType | ByteType => Some('L')
    case DoubleType | FloatType => Some('D')
    case StringType => Some('S')
    case DateType | TimestampType | TimestampNTZType => Some('T')
    case _: DecimalType => Some('C')
    case _ => None
  }

  private def walk(n: PredNode): Seq[(String, Any, Any)] = n match {
    case Fn("and", Seq(l, r)) => walk(l) ++ walk(r)
    case Fn("=" | "==" | "<=>", Seq(a, b)) => point(a, b)
    case Fn(">", Seq(a, b)) => lower(a, b) ++ upper(b, a)
    case Fn(">=", Seq(a, b)) => lower(a, b) ++ upper(b, a)
    case Fn("<", Seq(a, b)) => upper(a, b) ++ lower(b, a)
    case Fn("<=", Seq(a, b)) => upper(a, b) ++ lower(b, a)
    case Fn("in", args) if args.length >= 2 =>
      attrOf(args.head).toSeq.flatMap { c =>
        val lits = args.tail.map(litOf)
        // every element must be a safe literal of ONE family, or the
        // hull is not derivable
        if (lits.exists(_.isEmpty)) Nil
        else {
          val values = lits.flatten
          if (values.map(famOf).distinct.length != 1) Nil
          else {
            val sorted = values.sortWith(lt)
            Seq((c, sorted.head, sorted.last))
          }
        }
      }
    case _ => Nil
  }

  /** `attr = lit` in either operand order → the point box. */
  private def point(a: PredNode, b: PredNode): Seq[(String, Any, Any)] =
    (side(a, b) ++ side(b, a)).map { case (c, v) => (c, v, v) }

  /** `attr >= lit` (attr on the left): lower bound, sentinel top. */
  private def lower(a: PredNode, b: PredNode): Seq[(String, Any, Any)] =
    side(a, b).flatMap { case (c, v) => maxOf(v).map(hi => (c, v, hi)) }

  /** `attr <= lit` (attr on the left): upper bound, sentinel bottom. */
  private def upper(a: PredNode, b: PredNode): Seq[(String, Any, Any)] =
    side(a, b).map { case (c, v) => (c, minOf(v), v) }

  private def side(attr: PredNode, lit: PredNode): Seq[(String, Any)] =
    (for { c <- attrOf(attr); v <- litOf(lit) } yield (c, v)).toSeq

  private def attrOf(n: PredNode): Option[String] = n match {
    case Attr(name) => Some(name)
    case _ => None
  }

  /** A literal safe to compare against manifest stats — integral,
    * floating, string, date/timestamp (external java.sql / java.time
    * forms AND internal days/micros alike, canonicalized into
    * [[FileEntry.Micros]], the manifest's one datetime unit), or
    * decimal (canonicalized to java BigDecimal — scale travels with
    * the value) — with any DECLARED type agreeing with the runtime
    * value. A value under a datetime/decimal declared type in any
    * shape this walk can't prove the unit of is refused, never
    * guessed. */
  private def litOf(n: PredNode): Option[Any] = n match {
    case Lit(v, dtOpt) if v != null =>
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      (v, dtOpt) match {
        case (d: java.sql.Date, _) => Some(FileEntry.Micros(
          FileEntry.scaleMicros(DateTimeUtils.fromJavaDate(d),
            FileEntry.MicrosPerDay)))
        case (d: java.time.LocalDate, _) => Some(FileEntry.Micros(
          FileEntry.scaleMicros(DateTimeUtils.localDateToDays(d),
            FileEntry.MicrosPerDay)))
        case (t: java.sql.Timestamp, _) => Some(FileEntry.Micros(
          DateTimeUtils.fromJavaTimestamp(t)))
        case (t: java.time.Instant, _) => Some(FileEntry.Micros(
          DateTimeUtils.instantToMicros(t)))
        case (t: java.time.LocalDateTime, _) => Some(FileEntry.Micros(
          DateTimeUtils.localDateTimeToMicros(t)))
        case (days: Int, Some(DateType)) => Some(FileEntry.Micros(
          FileEntry.scaleMicros(days, FileEntry.MicrosPerDay)))
        case (us: Long, Some(TimestampType | TimestampNTZType)) =>
          Some(FileEntry.Micros(us))
        case (d: java.math.BigDecimal, _) => Some(d)
        case (d: scala.math.BigDecimal, _) => Some(d.bigDecimal)
        case (d: Decimal, _) => Some(d.toJavaBigDecimal)
        case (_, Some(DateType | TimestampType | TimestampNTZType |
                      _: DecimalType)) => None
        case (_: Int | _: Long | _: Short | _: Byte, dt)
            if typeAgrees(v, dt) => Some(v)
        case (_: Double | _: Float, dt) if typeAgrees(v, dt) => Some(v)
        case (_: String, dt) if typeAgrees(v, dt) => Some(v)
        case _ => None
      }
    case _ => None
  }

  private def typeAgrees(v: Any, dtOpt: Option[DataType]): Boolean =
    dtOpt.forall { dt =>
      (v, dt) match {
        case (_: Int, IntegerType) | (_: Long, LongType) |
             (_: Short, ShortType) | (_: Byte, ByteType) |
             (_: Double, DoubleType) | (_: Float, FloatType) |
             (_: String, StringType) => true
        case _ => false
      }
    }

  private def famOf(v: Any): Char = v match {
    case _: Long | _: Int | _: Short | _: Byte => 'L'
    case _: Double | _: Float => 'D'
    case _: FileEntry.Micros => 'T'
    case _: java.math.BigDecimal => 'C'
    case _ => 'S'
  }

  private def lt(a: Any, b: Any): Boolean = (famOf(a): @unchecked) match {
    case 'L' => toL(a) < toL(b)
    case 'D' => toD(a) < toD(b)
    case 'T' => a.asInstanceOf[FileEntry.Micros].us <
      b.asInstanceOf[FileEntry.Micros].us
    case 'C' => a.asInstanceOf[java.math.BigDecimal]
      .compareTo(b.asInstanceOf[java.math.BigDecimal]) < 0
    case 'S' => a.asInstanceOf[String] < b.asInstanceOf[String]
  }

  private def toL(v: Any): Long = v match {
    case n: Long => n; case n: Int => n.toLong
    case n: Short => n.toLong; case n: Byte => n.toLong
  }
  private def toD(v: Any): Double = v match {
    case n: Double => n; case n: Float => n.toDouble
  }

  private def minOf(v: Any): Any = (famOf(v): @unchecked) match {
    case 'L' => Long.MinValue
    case 'D' => Double.NegativeInfinity
    case 'T' => FileEntry.Micros(Long.MinValue)
    case 'C' => DecimalSentinelLo
    case 'S' => "" // the minimal string
  }

  /** The sentinel TOP of v's family — None for strings (no finite
    * maximum string exists; an upper-open string bound is dropped). */
  private def maxOf(v: Any): Option[Any] = (famOf(v): @unchecked) match {
    case 'L' => Some(Long.MaxValue)
    case 'D' => Some(Double.PositiveInfinity)
    case 'T' => Some(FileEntry.Micros(Long.MaxValue))
    case 'C' => Some(DecimalSentinelHi)
    case 'S' => None
  }

  // beyond any value a precision-38 decimal can hold, either side
  private val DecimalSentinelHi = new java.math.BigDecimal("1E+39")
  private val DecimalSentinelLo = new java.math.BigDecimal("-1E+39")
}
