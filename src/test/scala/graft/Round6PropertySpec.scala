package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cdc, Sampling, Temporal}

/** Generative properties for the round-6 operator contracts — random
  * inputs instead of the handpicked cases in Round6OpsSpec. Iteration
  * counts are small (each case runs Spark jobs); the generators bias
  * toward the hazardous shapes (null keys, closed timelines, boundary
  * timestamps, non-positive weights). */
class Round6PropertySpec extends AnyFunSuite {
  import SparkTestSession.forAll
  lazy val spark = SparkTestSession.spark

  test("mergeRollup fold chain ≡ one groupBy over the union (random batches)") {
    import spark.implicits._
    val batchGen = Gen.listOfN(12, for {
      k <- Gen.oneOf(Some("a"), Some("b"), Some("c"), None)
      s <- Gen.chooseNum(-50L, 50L)
      n <- Gen.chooseNum(0L, 5L)
    } yield (k, s, n))
    val batchesGen = Gen.chooseNum(2, 4).flatMap(Gen.listOfN(_, batchGen))
    forAll(batchesGen, n = 6) { batches =>
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("k").agg(sum("s").as("s"), sum("n").as("n"))
      val dfs = batches.map(_.toDF("k", "s", "n")).map(agg)
      val folded = dfs.reduce(Cdc.mergeRollup(_, _, Seq("k")))
      val full = agg(batches.flatten.toDF("k", "s", "n"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
      assert(rows(folded) == rows(full))
    }
  }

  test("scd2ViaAsOf ≡ scd2Join on random partitioned timelines") {
    import spark.implicits._
    // per key: sorted distinct breakpoints → contiguous versions;
    // final version open or closed at a further breakpoint
    val keyTimeline = for {
      k <- Gen.chooseNum(1L, 4L)
      nBreaks <- Gen.chooseNum(1, 4)
      breaks <- Gen.listOfN(nBreaks + 1, Gen.chooseNum(0L, 1000L))
      open <- Gen.oneOf(true, false)
    } yield (k, breaks.distinct.sorted, open)
    val dimGen = Gen.listOfN(4, keyTimeline).map { ts =>
      ts.groupBy(_._1).values.map(_.head).toList.flatMap {
        case (k, breaks, open) =>
          // a closed final version ends at breaks.last + 100; an open
          // one has valid_to null; every other valid_to is the next
          // version's valid_from (the contiguity contract)
          breaks.zipWithIndex.map { case (f, i) =>
            val to =
              if (i < breaks.length - 1) Some(breaks(i + 1))
              else if (open) None
              else Some(breaks.last + 100L)
            (k, f, to, s"v${k}_$i")
          }
      }
    }
    val factsGen = Gen.listOfN(30, for {
      k <- Gen.chooseNum(1L, 5L) // includes keys absent from dim
      t <- Gen.chooseNum(-50L, 1200L)
    } yield (k, t))
    forAll(Gen.zip(dimGen, factsGen), n = 8) { case (dim, facts) =>
      val dimDf = dim.toDF("k", "valid_from", "valid_to", "payload")
      val factDf = facts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "ts", "fact_id")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("fact_id", "payload").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val viaJoin = rows(Temporal.scd2Join(factDf, dimDf, "k", "k", "ts"))
      val viaAsOf = rows(Temporal.scd2ViaAsOf(factDf, dimDf, "k", "k", "ts"))
      assert(viaAsOf == viaJoin,
        s"divergence\ndim=$dim\nmissing=${viaJoin -- viaAsOf}\nextra=${viaAsOf -- viaJoin}")
    }
  }

  test("weightedSample: n ≥ valid rows ⇒ exactly the positive-weight rows") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(25, for {
      id <- Gen.chooseNum(1L, 1000000L)
      w <- Gen.oneOf(Gen.chooseNum(0.001, 100.0), Gen.chooseNum(-5.0, 0.0))
    } yield (id, w)).map(_.distinctBy(_._1))
    forAll(rowsGen, n = 6) { rows =>
      val df = rows.toDF("id", "w")
      val kept = Sampling.weightedSample(df, "id", "w", n = rows.length + 1)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(kept == rows.filter(_._2 > 0).map(_._1).toSet)
    }
  }

  test("knnClassify: predictions invariant under monotone label renaming") {
    import spark.implicits._
    // if labels are renamed by an order-preserving map, predictions
    // must be the renamed originals — pins that vote counting and
    // tie-breaking depend only on the label ORDER, not its type
    val trainGen = Gen.listOfN(20, for {
      id <- Gen.chooseNum(0L, 1000L)
      x <- Gen.chooseNum(-1.0, 1.0)
      y <- Gen.chooseNum(-1.0, 1.0)
      lbl <- Gen.chooseNum(0, 4)
    } yield (id, Array(x, y), lbl)).map(_.distinctBy(_._1))
    forAll(trainGen, n = 5) { train =>
      val queries = Seq((9001L, Array(0.3, 0.7)), (9002L, Array(-0.5, 0.1)))
        .toDF("id", "emb")
      val intTrain = train.toDF("id", "emb", "lbl")
      val strTrain = train.map { case (i, e, l) => (i, e, f"L$l%02d") }
        .toDF("id", "emb", "lbl")
      val intPred = graft.operators.Similarity
        .knnClassify(queries, intTrain, "id", "emb", "lbl", k = 5)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val strPred = graft.operators.Similarity
        .knnClassify(queries, strTrain, "id", "emb", "lbl", k = 5)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      intPred.foreach { case (id, l) =>
        assert(strPred(id) == f"L$l%02d", s"query $id: $l vs ${strPred(id)}")
      }
    }
  }
}
