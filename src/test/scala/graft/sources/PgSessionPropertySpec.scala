package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.PropSpec
import graft.core.PackedRow

/** Randomized SESSION-level conformance: generate arbitrary legal
  * interleavings of v1 plain, v2 streamed (with whole-tx and
  * subtransaction aborts) and v3 prepared transactions (committed and
  * rolled back, streamed and not), drive them through one
  * [[PgOutput.DecodeSession]], and check the spec-level invariants the
  * protocol guarantees REGARDLESS of interleaving:
  *
  *  1. exactly-once — every row of every transaction whose final
  *     decision is commit / COMMIT PREPARED appears exactly once;
  *  2. atomicity — no row of an aborted transaction, rolled-back
  *     prepare, or aborted subtransaction ever surfaces;
  *  3. commit-order delivery — lines leave the session grouped by
  *     transaction, stamped with the DECISION's commit LSN, in
  *     strictly increasing decision order (what the apply layer's
  *     (commit_lsn, tx_ordinal) total order relies on);
  *  4. in-transaction order — a transaction's surviving rows replay in
  *     their original insertion order with strictly increasing
  *     ordinals.
  *
  * This complements the byte-pinned recorded sessions in
  * [[PgConformanceSpec]] (which fix EXACT bytes for specific
  * schedules) by exploring the schedule space itself — the dimension a
  * live PG exercises that fixed recordings cannot. */
class PgSessionPropertySpec extends AnyFunSuite with PropSpec {
  import PgOutput._

  private val rel = Relation(1, "public", "t", 'd', IndexedSeq(
    RelCol(1, "id", 20, -1), RelCol(0, "tok", 25, -1)))

  /** Half the aborts ride the v4 EXTENDED Stream Abort frame (abort
    * LSN + timestamp, PG 16 `streaming 'parallel'`) — the replay
    * outcome must be identical regardless of the tail's presence. */
  private def abortFrame(xid: Int, subXid: Int): Message =
    if (xid % 2 == 0)
      StreamAbort(xid, subXid, Some(0x19000L + xid), Some(7L))
    else StreamAbort(xid, subXid)

  // ------------------------------------------------------------- model
  private sealed trait Kind
  private case object Plain extends Kind
  private final case class Streamed(commits: Boolean,
      subAbort: Boolean) extends Kind
  private final case class Prepared(commits: Boolean,
      streamed: Boolean) extends Kind

  /** One transaction: xid, kind, row tokens; when `subAbort`, the LAST
    * `subRows` tokens of block 1 belong to an aborted subtransaction
    * (its segment sits at the block tail, so truncate-to-subxact-start
    * and filter-by-xid semantics agree on the outcome). */
  private final case class Tx(xid: Int, kind: Kind,
      rows: Vector[String], subRows: Int) {
    def gid = s"gid$xid"
    def subXid: Int = xid + 1000
    def deadRows: Set[String] = kind match {
      case Streamed(false, _) => rows.toSet
      case Streamed(true, true) => rows.take(subRows).toSet
      case Prepared(false, _) => rows.toSet
      case _ => Set.empty
    }
    def survivors: Vector[String] = kind match {
      case Plain => rows
      case Streamed(true, sub) => if (sub) rows.drop(subRows) else rows
      case Prepared(true, _) => rows
      case _ => Vector.empty
    }
    def decides: Boolean = kind match {
      case Plain => true
      case Streamed(c, _) => c
      case Prepared(c, _) => c
    }
  }

  /** Atomic schedule units (contiguous frame runs); per-tx order is
    * fixed, the cross-tx merge is the random part. */
  private sealed trait Unit0 { def tx: Tx }
  private final case class UPlain(tx: Tx) extends Unit0
  private final case class UBlock(tx: Tx, n: Int, first: Boolean,
      rows: Vector[(Int, String)]) extends Unit0 // (subxid, token)
  private final case class USubAbort(tx: Tx) extends Unit0
  private final case class UStreamDecide(tx: Tx) extends Unit0
  private final case class UPrepBody(tx: Tx) extends Unit0
  private final case class UStreamPrepare(tx: Tx) extends Unit0
  private final case class UPrepDecide(tx: Tx) extends Unit0

  private def unitsOf(tx: Tx): Vector[Unit0] = tx.kind match {
    case Plain => Vector(UPlain(tx))
    case Streamed(_, sub) =>
      // block 1 carries any sub-aborted tail segment; block 2 the rest
      val (b1, b2) =
        if (sub) (tx.rows.take(tx.subRows).map(t => (tx.subXid, t)),
          tx.rows.drop(tx.subRows).map(t => (tx.xid, t)))
        else {
          val half = (tx.rows.length + 1) / 2
          (tx.rows.take(half).map(t => (tx.xid, t)),
            tx.rows.drop(half).map(t => (tx.xid, t)))
        }
      val blocks = Vector(UBlock(tx, 1, first = true, b1)) ++
        (if (sub) Vector(USubAbort(tx)) else Vector.empty) ++
        (if (b2.nonEmpty) Vector(UBlock(tx, 2, first = false, b2))
         else Vector.empty)
      blocks :+ UStreamDecide(tx)
    case Prepared(_, streamed) =>
      if (streamed) {
        val half = (tx.rows.length + 1) / 2
        Vector(
          UBlock(tx, 1, first = true,
            tx.rows.take(half).map(t => (tx.xid, t))),
          UBlock(tx, 2, first = false,
            tx.rows.drop(half).map(t => (tx.xid, t))),
          UStreamPrepare(tx), UPrepDecide(tx))
      } else Vector(UPrepBody(tx), UPrepDecide(tx))
  }

  /** Random stable merge of the per-tx unit sequences. */
  private def genMerge(seqs: Vector[Vector[Unit0]]): Gen[Vector[Unit0]] = {
    def step(pending: Vector[Vector[Unit0]],
        acc: Vector[Unit0]): Gen[Vector[Unit0]] = {
      val live = pending.filter(_.nonEmpty)
      if (live.isEmpty) Gen.const(acc)
      else Gen.choose(0, live.size - 1).flatMap { i =>
        val picked = live(i)
        step(live.updated(i, picked.tail), acc :+ picked.head)
      }
    }
    step(seqs, Vector.empty)
  }

  private val genTxs: Gen[Vector[Tx]] = for {
    n <- Gen.choose(2, 6)
    kinds <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(Plain),
      for { c <- Gen.oneOf(true, false); s <- Gen.oneOf(true, false) }
        yield Streamed(c, s),
      for { c <- Gen.oneOf(true, false); s <- Gen.oneOf(true, false) }
        yield Prepared(c, s)))
    sizes <- Gen.listOfN(n, Gen.choose(2, 4))
  } yield kinds.zip(sizes).zipWithIndex.map { case ((k, sz), i) =>
    val xid = 100 + i
    Tx(xid, k, (0 until sz).map(j => s"x${xid}_$j").toVector,
      subRows = 1)
  }.toVector

  private val genSchedule: Gen[Vector[Unit0]] =
    genTxs.flatMap(txs => genMerge(txs.map(unitsOf)))

  // ------------------------------------------------------- materialize
  private def row(tok: String): TupleData =
    IndexedSeq(TText(tok.hashCode.abs.toString), TText(tok))

  /** Play the schedule; returns (lines, decision order of committed
    * txs, decision LSN per xid). */
  private def play(schedule: Vector[Unit0])
      : (Vector[String], Vector[Int], Map[Int, Long]) = {
    val s = new DecodeSession()
    val out = Vector.newBuilder[String]
    var lsn = 0x1000L
    def next(): Long = { lsn += 0x100L; lsn }
    val prepLsn = scala.collection.mutable.Map.empty[Int, Long]
    val decisionLsn = scala.collection.mutable.Map.empty[Int, Long]
    val decisionOrder = Vector.newBuilder[Int]
    out ++= s.onFrame(encode(rel))
    schedule.foreach {
      case UPlain(tx) =>
        val l = next()
        out ++= s.onFrame(encode(Begin(l, 7L, tx.xid)))
        tx.rows.foreach(t => out ++= s.onFrame(encode(Insert(1, row(t)))))
        out ++= s.onFrame(encode(Commit(0, l, l + 8, 7L)))
        decisionLsn(tx.xid) = l; decisionOrder += tx.xid
      case UBlock(tx, _, first, rows) =>
        out ++= s.onFrame(encode(StreamStart(tx.xid, first)))
        rows.foreach { case (sub, t) =>
          out ++= s.onFrame(encodeStreamed(sub, Insert(1, row(t))))
        }
        out ++= s.onFrame(encode(StreamStop))
      case USubAbort(tx) =>
        out ++= s.onFrame(encode(abortFrame(tx.xid, tx.subXid)))
      case UStreamDecide(tx) => tx.kind match {
        case Streamed(true, _) =>
          val l = next()
          out ++= s.onFrame(encode(StreamCommit(tx.xid, 0, l, l + 8, 7L)))
          decisionLsn(tx.xid) = l; decisionOrder += tx.xid
        case _ =>
          out ++= s.onFrame(encode(abortFrame(tx.xid, tx.xid)))
      }
      case UPrepBody(tx) =>
        val l = next()
        prepLsn(tx.xid) = l
        out ++= s.onFrame(encode(BeginPrepare(l, l + 8, 7L, tx.xid, tx.gid)))
        tx.rows.foreach(t => out ++= s.onFrame(encode(Insert(1, row(t)))))
        out ++= s.onFrame(encode(Prepare(0, l, l + 8, 7L, tx.xid, tx.gid)))
      case UStreamPrepare(tx) =>
        val l = next()
        prepLsn(tx.xid) = l
        out ++= s.onFrame(encode(
          StreamPrepare(0, l, l + 8, 7L, tx.xid, tx.gid)))
      case UPrepDecide(tx) => tx.kind match {
        case Prepared(true, _) =>
          val l = next()
          out ++= s.onFrame(encode(
            CommitPrepared(0, l, l + 8, 7L, tx.xid, tx.gid)))
          decisionLsn(tx.xid) = l; decisionOrder += tx.xid
        case _ =>
          val l = next()
          out ++= s.onFrame(encode(RollbackPrepared(0,
            prepLsn(tx.xid) + 8, l + 8, 7L, 7L, tx.xid, tx.gid)))
      }
    }
    s.close()
    (out.result(), decisionOrder.result(), decisionLsn.toMap)
  }

  // --------------------------------------------------------- property
  test("random v1/v2/v3 interleavings: exactly-once, atomicity, " +
      "commit-order delivery, in-transaction order") {
    checkProp(Prop.forAll(genSchedule) { schedule =>
      val txs = schedule.map(_.tx).distinct
      val (lines, decisionOrder, decisionLsn) = play(schedule)
      val data = lines.filter(_.split("\t", -1)(2) == "I")
        .map { l =>
          val f = l.split("\t", -1)
          val tok = PackedRow.parse(f(7))(1).get
          (f(0).toLong, f(1).toLong, tok)
        }

      // 1+2: exactly-once for survivors, nothing for the dead
      val expected = txs.flatMap(_.survivors)
      val got = data.map(_._3)
      val exactlyOnce = got.sorted == expected.sorted &&
        got.distinct.size == got.size
      val deadTokens = txs.flatMap(_.deadRows).toSet
      val noDead = !got.exists(deadTokens)

      // 3: lines grouped per decision, increasing decision LSNs
      val lsnSeq = data.map(_._1)
      val monotone = lsnSeq == lsnSeq.sorted
      val perTxLsn = txs.filter(t => t.decides && t.survivors.nonEmpty)
        .forall { t =>
          val mine = data.filter(d => t.survivors.contains(d._3))
          mine.forall(_._1 == decisionLsn(t.xid))
        }
      val groupOrder = {
        val order = data.map(_._1).distinct
        val expectedOrder = decisionOrder
          .filter(x => txs.find(_.xid == x).exists(_.survivors.nonEmpty))
          .map(decisionLsn)
        order == expectedOrder
      }

      // 4: in-transaction insertion order + increasing ordinals
      val inOrder = txs.filter(_.survivors.nonEmpty).forall { t =>
        val mine = data.filter(d => t.survivors.contains(d._3))
        mine.map(_._3) == t.survivors &&
          mine.map(_._2) == mine.map(_._2).sorted &&
          mine.map(_._2).distinct.size == mine.size
      }

      val ok = exactlyOnce && noDead && monotone && perTxLsn &&
        groupOrder && inOrder
      if (!ok) {
        info(s"schedule: ${schedule.map(u => u.getClass.getSimpleName +
          u.tx.xid).mkString(" ")}")
        info(s"lines:\n${lines.mkString("\n")}")
        info(s"exactlyOnce=$exactlyOnce noDead=$noDead " +
          s"monotone=$monotone perTxLsn=$perTxLsn " +
          s"groupOrder=$groupOrder inOrder=$inOrder")
      }
      ok
    })
  }
}
