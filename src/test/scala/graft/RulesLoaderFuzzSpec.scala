package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.IpUtil
import graft.model.FieldRegistry
import graft.query.RulesLoader

/** Differential fuzz for the rules-file loader: random rule files
  * (generated as YAML text, so the parser is inside the loop) applied
  * through `applySpi` must agree row-by-row with a naive in-memory
  * evaluator implementing rules.c's documented semantics — AND across
  * field positions, OR across one field's values and modifier variants,
  * modifier == substring (the rules.c:794-816 fall-through), CIDR
  * containment for ip values, NULL columns never matching, and
  * `_dontSaveSPI` dropping matched rows.
  */
final case class RulesFuzzRow(id: Int, dstPort: Int, srcIp: String,
    protocol: Seq[String], httpHost: Seq[String], tcpflagsSyn: Int)

class RulesLoaderFuzzSpec extends AnyFunSuite with SparkSpecBase {

  private var seed = 0x12fcadL
  private def next(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }

  private type Row = RulesFuzzRow
  private def Row(id: Int, dstPort: Int, srcIp: String,
      protocol: Seq[String], httpHost: Seq[String], tcpflagsSyn: Int): RulesFuzzRow =
    RulesFuzzRow(id, dstPort, srcIp, protocol, httpHost, tcpflagsSyn)

  test("40 random rule files agree with the naive evaluator") {
    val sess = spark
    import sess.implicits._

    val hostPool = Seq("a.example.com", "b.example.org", "cdn.b.c.d",
      "x.ample.common", "bl.and.y", "plain")
    val protoPool = Seq("tcp", "udp", "tls", "http", "dns")

    (0 until 40).foreach { trial =>
      // ---- random frame (some NULL ips, empty arrays) ----------------
      val rows = (0 until 40).map { i =>
        Row(i,
          4000 + next(6),
          if (next(5) == 0) null
          else s"10.${next(4) * 64}.${next(3)}.${next(250)}",
          (0 until next(3)).map(_ => protoPool(next(protoPool.size)))
            .distinct,
          (0 until next(3)).map(_ => hostPool(next(hostPool.size)))
            .distinct,
          next(3))
      }

      // ---- random rules as YAML text ---------------------------------
      final case class FieldGen(expr: String, mod: Option[String],
          values: Seq[String])
      final case class RuleGen(name: String, fields: Seq[FieldGen],
          drop: Boolean)
      val nRules = 1 + next(3)
      val gens = (0 until nRules).map { r =>
        val nFields = 1 + next(3)
        val fields = (0 until nFields).map { _ =>
          next(5) match {
            case 0 => FieldGen("port.dst", None,
              (0 until 1 + next(2)).map(_ => (4000 + next(6)).toString))
            case 1 => FieldGen("ip.src", None,
              (0 until 1 + next(2)).map(_ =>
                Seq(s"10.${next(4) * 64}.0.0/10", s"10.${next(4) * 64}.${next(3)}.${next(250)}",
                  "10.0.0.0/8")(next(3))))
            case 2 => FieldGen("protocols", None,
              (0 until 1 + next(2)).map(_ => protoPool(next(protoPool.size))))
            case 3 =>
              val mod = Seq(None, Some("endsWith"), Some("startsWith"),
                Some("contains"))(next(4))
              FieldGen("host.http", mod,
                (0 until 1 + next(2)).map(_ => Seq("example", "b.c", "bl.a",
                  "plain", "a.example.com", "common")(next(6))))
            case _ => FieldGen("tcpflags.syn", None, Seq(next(3).toString))
          }
        }
        RuleGen(s"r$r", fields, drop = next(4) == 0)
      }
      val yaml = new StringBuilder("version: 1\nrules:\n")
      gens.foreach { g =>
        yaml.append(s"  - name: ${g.name}\n")
        yaml.append(s"    when: ${if (g.drop) "beforeFinalSave" else "fieldSet"}\n")
        yaml.append("    fields:\n")
        // emit per (expr, mod) pair — duplicates of one base expression
        // across variants exercise the OR-merge
        g.fields.foreach { f =>
          val key = f.expr + f.mod.map("," + _).getOrElse("")
          yaml.append(s"      $key:\n")
          f.values.foreach(v => yaml.append(s"        - $v\n"))
        }
        yaml.append("    ops:\n")
        if (g.drop) yaml.append("      _dontSaveSPI: 1\n")
        else yaml.append(s"      protocols: \"tag-${g.name}\"\n")
      }
      val rules = RulesLoader.load(yaml.toString, FieldRegistry.sessions)

      // ---- naive evaluation ------------------------------------------
      def cidrHit(ip: String, v: String): Boolean = {
        if (ip == null) return false
        val cidr = if (v.contains("/")) v else s"$v/32"
        val b = IpUtil.toBytes(ip)
        b != null && IpUtil.parseCidr(cidr).exists(_.contains(b))
      }
      def fieldHit(row: Row, f: FieldGen, siblings: Seq[FieldGen]): Boolean = {
        // OR across every variant of the same base expression
        val variants = siblings.filter(_.expr == f.expr)
        variants.exists { v =>
          v.expr match {
            case "port.dst" => v.values.exists(_.toInt == row.dstPort)
            case "tcpflags.syn" => v.values.exists(_.toInt == row.tcpflagsSyn)
            case "ip.src" => v.values.exists(cidrHit(row.srcIp, _))
            case "protocols" => v.values.exists(row.protocol.contains)
            case "host.http" => v.mod match {
              case None => v.values.exists(row.httpHost.contains)
              case Some(_) => // fall-through: every modifier is contains
                v.values.exists(p => row.httpHost.exists(_.contains(p)))
            }
          }
        }
      }
      def ruleHit(row: Row, g: RuleGen): Boolean =
        g.fields.map(_.expr).distinct.forall { base =>
          fieldHit(row, g.fields.find(_.expr == base).get, g.fields)
        }
      val naive: Map[Int, Option[Seq[String]]] = rows.map { row =>
        val dropped = gens.exists(g => g.drop && ruleHit(row, g))
        if (dropped) row.id -> None
        else {
          val tags = gens.filter(g => !g.drop && ruleHit(row, g))
            .map(g => s"tag-${g.name}")
          row.id -> Some((row.protocol ++ tags).distinct.sorted)
        }
      }.toMap

      // ---- engine ----------------------------------------------------
      val df = rows.toDF()
      val got = RulesLoader.applySpi(df, rules)
        .select(col("id"), col("protocol")).as[(Int, Seq[String])]
        .collect().toMap
      rows.foreach { row =>
        naive(row.id) match {
          case None => assert(!got.contains(row.id),
            s"trial=$trial row=${row.id} should be dropped")
          case Some(want) =>
            assert(got.get(row.id).map(_.sorted).contains(want),
              s"trial=$trial row=${row.id} got=${got.get(row.id)} want=$want")
        }
      }
    }
  }
}
