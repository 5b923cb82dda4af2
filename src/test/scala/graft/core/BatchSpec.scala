package graft.core

import java.time.{Duration, Instant}
import org.scalatest.funsuite.AnyFunSuite

class BatchSpec extends AnyFunSuite {

  private val t0 = Instant.parse("2026-01-13T00:00:00Z")
  private val t1 = Instant.parse("2026-01-13T00:10:00Z")

  test("batch_run_date is the interval start shifted back one interval") {
    val w = BatchWindow(t0, t1)
    assert(Batch.naiveRunDate(w).toString == "2026-01-12T23:50")
  }

  test("batch id composes runId and alias") {
    assert(BatchId("scheduled__2026-01-13T00:00:00", "ledgers").value ==
      "scheduled__2026-01-13T00:00:00-ledgers")
  }

  test("backfill chunking covers the range half-open without overlap") {
    val w = BatchWindow(t0, t0.plus(Duration.ofHours(7)))
    val chunks = w.chunks(Duration.ofHours(3))
    assert(chunks.size == 3)
    assert(chunks.head.start == t0)
    assert(chunks.last.end == w.end)
    // adjacent chunks share exactly their boundary
    chunks.sliding(2).foreach { case Seq(a, b) => assert(a.end == b.start); case _ => }
    // last chunk is clipped
    assert(Duration.between(chunks.last.start, chunks.last.end) == Duration.ofHours(1))
  }
}
