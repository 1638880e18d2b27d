package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftext.GraftBridge
import org.apache.spark.sql.graftext.GraftBridge.{Attr, Fn, Lit, PredNode}
import org.apache.spark.sql.types._

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
  *    floating `±Infinity`, string `""` for the low end; an
  *    upper-open STRING bound is dropped — no finite max string).
  *  - `IN (v1…vn)` — the hull `[min v, max v]`.
  *
  * Only integral / floating / string literals qualify — matching
  * [[SnapshotTable.FileEntry.enc]]'s stat tag families exactly;
  * date/timestamp/decimal literals are refused (the manifest never
  * tags stats in their representations). */
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
    * type whose physical stats are in different units than its values
    * (decimal/date/timestamp/…). */
  private def familyOf(dt: DataType): Option[Char] = dt match {
    case IntegerType | LongType | ShortType | ByteType => Some('L')
    case DoubleType | FloatType => Some('D')
    case StringType => Some('S')
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

  /** A literal safe to compare against manifest stats: integral,
    * floating, or string, with any DECLARED type agreeing with the
    * runtime value (a declared DateType over an Int is days-since-
    * epoch, not a number the stats know). */
  private def litOf(n: PredNode): Option[Any] = n match {
    case Lit(v, dtOpt) if v != null && typeAgrees(v, dtOpt) =>
      v match {
        case _: Int | _: Long | _: Short | _: Byte => Some(v)
        case _: Double | _: Float => Some(v)
        case _: String => Some(v)
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
    case _ => 'S'
  }

  private def lt(a: Any, b: Any): Boolean = (famOf(a): @unchecked) match {
    case 'L' => toL(a) < toL(b)
    case 'D' => toD(a) < toD(b)
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
    case 'S' => "" // the minimal string
  }

  /** The sentinel TOP of v's family — None for strings (no finite
    * maximum string exists; an upper-open string bound is dropped). */
  private def maxOf(v: Any): Option[Any] = (famOf(v): @unchecked) match {
    case 'L' => Some(Long.MaxValue)
    case 'D' => Some(Double.PositiveInfinity)
    case 'S' => None
  }
}
