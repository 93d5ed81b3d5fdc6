package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Enrich

/** Differential fuzz for the bucketed Suricata alert/session interval
  * join (reference behavior: capture/plugins/suricata.c matches an
  * eve.json alert to the session with the same 5-tuple whose packet
  * time window covers the alert timestamp). The distributed plan fans a
  * session out to every bucket its [start, end] span touches and
  * equi-joins alerts on (key, bucket); this spec replays random
  * workloads through a naive O(n·m) matcher and requires the SAME
  * multiset of (session, alert) pairs — probing exactly the places the
  * bucketing could lie: spans/alerts ON bucket boundaries, zero-length
  * sessions, multi-bucket spans (duplicate-collapse via distinct),
  * several sessions sharing a key with overlapping windows, negative
  * epoch seconds (floor vs truncate-toward-zero), and alerts outside
  * every window.
  */
class SuricataJoinFuzzSpec extends AnyFunSuite with SparkSpecBase {

  test("bucketed interval join == naive matcher on 40 random workloads") {
    val sess = spark
    import sess.implicits._

    var seed = 0xa1e57L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }

    val bucket = 100L // small bucket so spans regularly straddle several
    (0 until 40).foreach { trial =>
      val nSess = 5 + next(20)
      val nAlerts = 5 + next(30)
      // timestamps clustered near bucket multiples so exact-boundary
      // values (t % bucket == 0) occur often; one trial in four goes
      // negative to pin floor-division bucketing below zero
      val base = if (trial % 4 == 3) -500L else 1000L * next(5)
      def ts(): Long = {
        val t = base + next(12) * bucket / 2 + (next(5) match {
          case 0 => 0L // exactly on a boundary candidate
          case 1 => -1L
          case 2 => 1L
          case _ => next(97).toLong
        })
        t
      }
      val sessions = (0 until nSess).map { i =>
        val a = ts(); val b = ts()
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val span = if (next(6) == 0) (lo, lo) else (lo, hi) // zero-length
        (s"k${next(4)}", span._1, span._2, s"s$i")
      }
      val alerts = (0 until nAlerts).map { j =>
        (s"k${next(4)}", ts(), s"a$j")
      }

      val naive = (for {
        (sk, lo, hi, sid) <- sessions
        (ak, at, aid) <- alerts
        if sk == ak && at >= lo && at <= hi
      } yield (sid, aid)).sorted

      val sDf = sessions.toDF("key", "start_s", "end_s", "sid")
      val aDf = alerts.toDF("key", "alert_s", "alert_id")
      val got = Enrich.alertSessionJoin(sDf, aDf, bucketSeconds = bucket)
        .select("sid", "alert_id").as[(String, String)].collect()
        .toSeq.sorted

      assert(got == naive,
        s"trial=$trial got=${got.size} want=${naive.size}")
    }
  }
}
