package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench isolation PLANNER — pure, so its coverage contract is
  * pinnable without running children: every shared row above the heavy
  * threshold is planned (r14 shipped a silent take(16) that dropped 5 of
  * 21 >5 s rows from the isolation set), the schedule runs one coverage
  * child per row before any median rep (so a budget cut degrades depth,
  * never coverage), and malformed specs degrade instead of throwing away
  * a multi-hour shared pass. */
class BenchSpec extends AnyFunSuite {

  private val rows: Seq[(String, Double)] =
    (1 to 21).map(i => (f"heavy_$i%02d", 5.0 + i)) ++ // 6.0 .. 26.0 s
      (1 to 30).map(i => (f"light_$i%02d", 0.1 * i))  // all under 5 s

  test("every row above the heavy threshold is planned — no silent cap") {
    val (plan, _) = Bench.planIsolation(rows, "slowest:10,heavy:5:3", Nil)
    val planned = plan.map(_._1).toSet
    val over = rows.filter(_._2 > 5.0).map(_._1)
    assert(over.size === 21)
    over.foreach(n => assert(planned.contains(n),
      s"$n exceeds the 5 s heavy bar but is not in the isolation plan — " +
        "the r14 take(16) hole"))
    // and each heavy row carries the median-of-R rep count
    plan.filter(p => over.contains(p._1)).foreach { case (n, r) =>
      assert(r === 3, s"$n planned with $r reps, expected heavy:_:3")
    }
  }

  test("plan is ordered worst shared row first; schedule is coverage-first") {
    val (plan, thr) = Bench.planIsolation(rows, "slowest:10,heavy:5:3", Nil)
    assert(thr === Some(5.0))
    val shared = rows.toMap
    val order = plan.map(p => shared(p._1))
    assert(order === order.sorted.reverse, s"plan not shared-desc: $plan")
    val sched = Bench.isolationSchedule(plan)
    // one child per planned row BEFORE any repeat: a budget cut then costs
    // median depth, never a row's only isolated figure
    val firstSeen = sched.distinct
    assert(sched.take(plan.size) === firstSeen,
      "schedule repeats a row before covering every planned row once")
    assert(sched.size === plan.map(_._2).sum)
  }

  test("slowest-only rows get one child; watch rows get the median reps") {
    val (plan, _) =
      Bench.planIsolation(rows, "slowest:25,heavy:5:3", Seq("light_30", "ghost_row"))
    val byName = plan.toMap
    // light_30 (3.0 s: slowest-25 member, under the heavy bar) is watched →
    // median-of-R treatment regardless of rank
    assert(byName("light_30") === 3)
    // a slowest-only member that is neither heavy nor watched runs once
    assert(byName("light_27") === 1)
    // a watch row that no longer exists in the run is dropped, not spawned
    assert(!byName.contains("ghost_row"))
  }

  test("malformed and off specs degrade to an empty plan, never throw") {
    assert(Bench.planIsolation(rows, "off", Nil)._1.isEmpty)
    assert(Bench.planIsolation(rows, "garbage", Nil)._1.isEmpty)
    assert(Bench.planIsolation(rows, "slowest:x,heavy:y", Nil)._1.isEmpty)
    // a half-valid spec keeps the valid clause
    val (plan, thr) = Bench.planIsolation(rows, "slowest:2,heavy:bad", Nil)
    assert(plan.size === 2 && thr.isEmpty)
    assert(plan.forall(_._2 === 1))
  }
}
