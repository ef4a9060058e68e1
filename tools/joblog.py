#!/usr/bin/env python3
"""Parse a Spark event log into a job timeline: one line per job with
submit time, duration, gap since the previous job ended, stage count, and
the job description — the profiling view VERDICT_r20 #1 asks for (job
count + driver-side gaps for the hier SemDeDup family).

Usage: python3 tools/joblog.py <eventlog-file-or-dir> [substr]

With `substr`, only jobs whose description contains it are listed (the
summary still covers every job). Spark writes one event-log file per
application (context-per-query bench = one file per query context).
"""
import sys, json, os, glob


def parse(path, substr=None):
    jobs = {}
    order = []
    t0 = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "submit": ev["Submission Time"],
                    "end": None,
                    "stages": len(ev.get("Stage Infos", [])),
                    "desc": props.get("spark.job.description", ""),
                }
                order.append(jid)
                if t0 is None:
                    t0 = ev["Submission Time"]
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
    if not order:
        return 0, 0.0, 0.0
    prev_end = None
    total_gap = 0.0
    total_run = 0.0
    shown = 0
    for jid in order:
        j = jobs[jid]
        end = j["end"] or j["submit"]
        dur = (end - j["submit"]) / 1000.0
        gap = (j["submit"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = max(prev_end or end, end)
        total_gap += max(gap, 0.0)
        total_run += dur
        if substr is None or substr in j["desc"]:
            print(f"  job {jid:4d} +{(j['submit']-t0)/1000.0:8.2f}s "
                  f"dur={dur:6.2f}s gap={gap:6.2f}s stages={j['stages']:3d} "
                  f"{j['desc'][:80]}")
            shown += 1
    print(f"  == {len(order)} jobs, sum(dur)={total_run:.2f}s, "
          f"sum(gap)={total_gap:.2f}s, span="
          f"{(prev_end-t0)/1000.0:.2f}s ({os.path.basename(path)})")
    return len(order), total_run, total_gap


def main():
    target = sys.argv[1]
    substr = sys.argv[2] if len(sys.argv) > 2 else None
    files = [target] if os.path.isfile(target) else sorted(
        glob.glob(f"{target}/*"), key=os.path.getmtime)
    for p in files:
        if os.path.isfile(p) and not p.endswith(".inprogress"):
            parse(p, substr)


if __name__ == "__main__":
    main()
