package graft

import org.apache.spark.sql.functions._

import graft.operators.Survival

/** Kaplan–Meier against hand-computed curves: the textbook fixture, the
  * everyone-converts S=0 tail, censoring semantics, and the durations
  * study-table contract (late-start end-events censor, not drop).
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier matches a hand-computed curve with interleaved censoring") {
    // Durations: events at t=2 (×2), t=5 (×1); censored at t=3 (×1), t=5 (×1).
    // n=5. t=2: n_risk 5, S = 1 - 2/5 = 0.6.
    // t=5: risk = 5 - (2 events + 1 censored@3) = 2; S = 0.6 * (1 - 1/2) = 0.3.
    val subj = Seq((2L, 1), (2L, 1), (3L, 0), (5L, 1), (5L, 0))
      .toDF("duration", "converted")
    val got = Survival.kaplanMeier(subj, "duration", "converted")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 5L, 2L, 0.6), (5L, 2L, 1L, 0.3)))
  }

  test("kaplanMeier pins the curve to exactly 0.0 when the last at-risk subject converts") {
    val subj = Seq((1L, 1), (2L, 1)).toDF("duration", "converted")
    val got = Survival.kaplanMeier(subj, "duration", "converted")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 1L, 0.0)))
  }

  test("durations: conversion strictly after start; stale end-events censor rather than drop") {
    val ev = Seq(
      (1L, "start", 100L), (1L, "end", 100L), (1L, "end", 250L), // end@100 not after start
      (2L, "start", 100L), (2L, "end", 50L), // only a STALE end → censored
      (3L, "start", 200L), // no end at all → censored
      (4L, "end", 500L) // never started → not in the study
    ).toDF("subj", "et", "t")
    val got = Survival.durations(ev, "subj", "et", "t",
      startType = "start", endType = "end", bucketMs = 100L, censorTs = 400L)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (1L, 1), // (250-100)/100 = 1, converted
      2L -> (3L, 0), // (400-100)/100 = 3, censored
      3L -> (2L, 0))) // (400-200)/100 = 2, censored
    assert(!got.contains(4L))
  }
}
