package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.TaskConfig
import graft.operators.CotripOps
import graft.sources.CotripSource

/** Property-based conformance (SURVEY §5.2-2): random feature sets are run
  * through the Spark pipeline and through a ~30-line plain-Scala oracle that
  * transcribes the reference semantics (task.ts:76-113) literally; outputs
  * must agree, and the structural invariants must hold.
  */
class PropertySpec extends SparkSpec {

  // --- plain-Scala reference oracle -------------------------------------
  final case class Feat(id: String, geomType: String, parts: List[String])
  // parts: for Multi* the top-level coordinate elements; else a single blob

  /** Literal reimplementation of task.ts:76-113 on collections. */
  def oracle(feats: List[Feat], allowed: List[String]): List[(String, String, String)] = {
    val exploded = feats.flatMap { f =>
      if (f.geomType.startsWith("Multi")) {
        val t = f.geomType.replaceFirst("Multi", "")
        f.parts.zipWithIndex.map { case (c, i) => (s"${f.id}-$i", t, c) }
      } else List((f.id, f.geomType, f.parts.headOption.orNull))
    }
    exploded.filter { case (_, t, _) => allowed.contains(t) }
  }

  // --- generators --------------------------------------------------------
  private val coordGen: Gen[String] = for {
    x <- Gen.chooseNum(-179, 179); y <- Gen.chooseNum(-89, 89)
  } yield s"[$x.5,$y.25]"

  private val featGen: Gen[Feat] = for {
    id <- Gen.identifier.map(_.take(8))
    base <- Gen.oneOf("Point", "LineString", "Polygon")
    multi <- Gen.oneOf(true, false)
    nParts <- Gen.chooseNum(0, 4)
    parts <- Gen.listOfN(if (multi) nParts else 1, coordGen)
  } yield {
    // keep coordinates JSON-shaped for the declared nesting (content depth is
    // irrelevant to the pipeline — it treats them as opaque raw JSON)
    def nest(c: String, depth: Int): String = (1 to depth).foldLeft(c)((s, _) => s"[$s]")
    val depth = base match { case "Point" => 0; case "LineString" => 1; case _ => 2 }
    if (multi) Feat(id, s"Multi$base", parts.map(nest(_, depth)))
    else Feat(id, base, parts.map(nest(_, depth)))
  }

  private def toJson(f: Feat): String = {
    val coords =
      if (f.geomType.startsWith("Multi")) f.parts.mkString("[", ",", "]")
      else f.parts.head
    s"""{"type":"Feature","properties":{"id":"${f.id}"},"geometry":{"type":"${f.geomType}","coordinates":$coords}}"""
  }

  private val configGen: Gen[(Boolean, Boolean, Boolean)] = for {
    p <- Gen.oneOf(true, false); l <- Gen.oneOf(true, false); g <- Gen.oneOf(true, false)
  } yield (p, l, g)

  // --- properties ---------------------------------------------------------
  test("pipeline == plain-Scala reference oracle on random inputs") {
    val gen = Gen.zip(Gen.listOfN(12, featGen), configGen)
    // deterministic sampling: fixed seed, 15 cases (no scalatest-scalacheck
    // bridge in the offline dependency cache)
    (0 until 15).foreach { i =>
      val (feats0, toggles) =
        gen(Gen.Parameters.default, Seed(42L + i)).get
        // reference ids must be unique for the bijection to be checkable
        val feats = feats0.zipWithIndex.map { case (f, i) => f.copy(id = s"${f.id}_$i") }
        val (p, l, g) = toggles
        val cfg = TaskConfig("t", p, l, g)
        val df = CotripSource.fromPages(spark,
          Seq(feats.map(toJson).mkString("{\"features\":[", ",", "]}")))
        val got = CotripOps.pipeline(df, cfg)
          .select("id", "geometry.type", "geometry.coordinates")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
        val want = oracle(feats, cfg.allowedTypes.toList).toSet
        assert(got === want)
        // invariants
        assert(got.map(_._2).subsetOf(Set("Point", "LineString", "Polygon")
          .intersect(cfg.allowedTypes.toSet)))
        assert(got.map(_._1).size === got.size) // ids stay unique
    }
  }
}
