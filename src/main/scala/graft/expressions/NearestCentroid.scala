package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** Nearest-centroid argmax as ONE native codegen kernel: for a row's
  * vector (and precomputed L2 norm), scan the broadcast-sized centroid
  * table held inside the expression and return struct(score, cid) of the
  * best cosine — larger score wins, larger cid breaks ties (exactly the
  * `array_max(array(struct(score, cid)))` contract the literal path used,
  * and the DuckDB mirror's `ORDER BY score DESC, cid DESC ... rn = 1`).
  *
  * This retires the k-dependent argmax representation switch the r3/r4
  * assignment kernel carried: the literal expression tree stopped
  * codegen-scaling past ~32 centroids (a measured 26x blowup at k=160),
  * and the broadcast-join fallback paid a vec_id-keyed shuffle + groupBy
  * + join-back per assignment. Here k is DATA (arrays referenced by the
  * generated code), not code — one tight j*d primitive loop fused into
  * the scan for any k up to the 256 cap, zero extra exchanges.
  *
  * Arithmetic is bit-compatible with both prior paths and the oracle:
  * per-centroid score = seqfold-dot(v, cv) / (nrm * cnrm) with the
  * centroid norm precomputed driver-side by the same fold, and double
  * comparison follows SQL semantics (NaN greatest, NaN == NaN,
  * -0.0 == 0.0) — the same total order array_max used.
  */
case class NearestCentroid(left: Expression, right: Expression,
                           centroids: Seq[(Int, Seq[Double], Double)])
    extends BinaryExpression {
  require(centroids.nonEmpty, "nearest_centroid: empty centroid table")

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okL = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (okL && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires (ARRAY<FLOAT|DOUBLE>, DOUBLE), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  // primitive mirrors of the Seq payload, built once per executor instance
  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvs: Array[Array[Double]] =
    centroids.map(_._2.toArray).toArray
  @transient private lazy val cnrms: Array[Double] = centroids.map(_._3).toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val isF = elemIsFloat
    var bestS = 0.0
    var bestC = 0
    var first = true
    var j = 0
    while (j < cids.length) {
      val cv = cvs(j)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        s += xv * cv(i)
        i += 1
      }
      val score = s / (nrm * cnrms(j))
      val better = if (first) true else {
        val c = NearestCentroid.cmp(score, bestS)
        c > 0 || (c == 0 && cids(j) > bestC)
      }
      if (better) { bestS = score; bestC = cids(j); first = false }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestS, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cvsRef = ctx.addReferenceObj("nc_cvs", cvs, "double[][]")
    val cnrmRef = ctx.addReferenceObj("nc_cnrms", cnrms, "double[]")
    val cidRef = ctx.addReferenceObj("nc_cids", cids, "int[]")
    val cls = classOf[NearestCentroid].getName
    // freshName locals: fixed names would collide (janino "redefinition")
    // when two instances share one codegen scope, silently demoting the
    // stage to interpreted evaluation
    val bestS = ctx.freshName("ncBestS"); val bestC = ctx.freshName("ncBestC")
    val firstV = ctx.freshName("ncFirst"); val j = ctx.freshName("ncJ")
    val cv = ctx.freshName("ncCv"); val n = ctx.freshName("ncN")
    val s = ctx.freshName("ncS"); val i = ctx.freshName("ncI")
    val score = ctx.freshName("ncScore"); val better = ctx.freshName("ncBetter")
    val c = ctx.freshName("ncC")
    nullSafeCodeGen(ctx, ev, (v, nrm) => s"""
      double $bestS = 0.0; int $bestC = 0; boolean $firstV = true;
      for (int $j = 0; $j < $cidRef.length; $j++) {
        double[] $cv = $cvsRef[$j];
        int $n = Math.min($v.numElements(), $cv.length);
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += (double) $v.$get($i) * $cv[$i];
        }
        double $score = $s / ($nrm * $cnrmRef[$j]);
        boolean $better;
        if ($firstV) { $better = true; } else {
          int $c = $cls.cmp($score, $bestS);
          $better = $c > 0 || ($c == 0 && $cidRef[$j] > $bestC);
        }
        if ($better) { $bestS = $score; $bestC = $cidRef[$j]; $firstV = false; }
      }
      ${ev.value} = new ${classOf[GenericInternalRow].getName}(
        new Object[]{$bestS, $bestC});""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "nearest_centroid"
}

/** Top-two variant of [[NearestCentroid]] for silhouette-style cluster
  * quality metrics: struct(score, cid, second) where (score, cid) keeps
  * the argmax contract above and `second` is the best score among the
  * OTHER centroids — exactly the value the mirror's
  * `ORDER BY score DESC, cid DESC ... rn = 2` row carries (under a
  * best-score tie both rows hold the same score value, so the cid
  * tie-break never reaches the surfaced double). Same row-local j*d
  * primitive loop fused into the scan; requires k >= 2. */
case class CentroidTopTwo(left: Expression, right: Expression,
                          centroids: Seq[(Int, Seq[Double], Double)])
    extends BinaryExpression {
  require(centroids.size >= 2, "centroid_top_two: needs >= 2 centroids")

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false),
    StructField("second", DoubleType, nullable = false)))

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okL = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (okL && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"centroid_top_two requires (ARRAY<FLOAT|DOUBLE>, DOUBLE), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvs: Array[Array[Double]] =
    centroids.map(_._2.toArray).toArray
  @transient private lazy val cnrms: Array[Double] = centroids.map(_._3).toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val isF = elemIsFloat
    var bestS = 0.0
    var bestC = 0
    var secondS = 0.0
    var nSeen = 0
    var j = 0
    while (j < cids.length) {
      val cv = cvs(j)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        s += xv * cv(i)
        i += 1
      }
      val score = s / (nrm * cnrms(j))
      if (nSeen == 0) { bestS = score; bestC = cids(j) }
      else {
        val c = NearestCentroid.cmp(score, bestS)
        if (c > 0 || (c == 0 && cids(j) > bestC)) {
          secondS = bestS; bestS = score; bestC = cids(j)
        } else if (nSeen == 1 || NearestCentroid.cmp(score, secondS) > 0) {
          secondS = score
        }
      }
      nSeen += 1
      j += 1
    }
    new GenericInternalRow(Array[Any](bestS, bestC, secondS))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cvsRef = ctx.addReferenceObj("ct2_cvs", cvs, "double[][]")
    val cnrmRef = ctx.addReferenceObj("ct2_cnrms", cnrms, "double[]")
    val cidRef = ctx.addReferenceObj("ct2_cids", cids, "int[]")
    val cls = classOf[NearestCentroid].getName
    nullSafeCodeGen(ctx, ev, (v, nrm) => s"""
      double t2_bestS = 0.0; int t2_bestC = 0; double t2_secS = 0.0; int t2_seen = 0;
      for (int t2_j = 0; t2_j < $cidRef.length; t2_j++) {
        double[] t2_cv = $cvsRef[t2_j];
        int t2_n = Math.min($v.numElements(), t2_cv.length);
        double t2_s = 0.0;
        for (int t2_i = 0; t2_i < t2_n; t2_i++) {
          t2_s += (double) $v.$get(t2_i) * t2_cv[t2_i];
        }
        double t2_score = t2_s / ($nrm * $cnrmRef[t2_j]);
        if (t2_seen == 0) { t2_bestS = t2_score; t2_bestC = $cidRef[t2_j]; }
        else {
          int t2_c = $cls.cmp(t2_score, t2_bestS);
          if (t2_c > 0 || (t2_c == 0 && $cidRef[t2_j] > t2_bestC)) {
            t2_secS = t2_bestS; t2_bestS = t2_score; t2_bestC = $cidRef[t2_j];
          } else if (t2_seen == 1 || $cls.cmp(t2_score, t2_secS) > 0) {
            t2_secS = t2_score;
          }
        }
        t2_seen++;
      }
      ${ev.value} = new ${classOf[GenericInternalRow].getName}(
        new Object[]{t2_bestS, t2_bestC, t2_secS});""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidTopTwo =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "centroid_top_two"
}

object CentroidTopTwo {
  /** struct(score, cid, second) — nearest centroid plus the best score
    * among the remaining centroids. */
  def centroid_top_two(v: Column, nrm: Column,
                       centroids: Seq[(Int, Seq[Double], Double)]): Column =
    ColumnBridge.column(CentroidTopTwo(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm), centroids))
}

object NearestCentroid {
  /** SQL double total order: -0.0 == 0.0, NaN == NaN, NaN greatest —
    * the comparison array_max/struct-max apply. Public: called from
    * generated code. */
  def cmp(a: Double, b: Double): Int =
    if (a < b) -1 else if (a > b) 1 else if (a == b) 0
    else java.lang.Double.compare(a, b)

  /** struct(score, cid) of the nearest centroid; `centroids` as
    * (cid, vector, precomputed L2 norm). */
  def nearest_centroid(v: Column, nrm: Column,
                       centroids: Seq[(Int, Seq[Double], Double)]): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm), centroids))
}
