#!/usr/bin/env python3
"""Aggregate Spark event-log stage timings by callsite.

Usage: parse_eventlog.py <eventlog file or dir> [--jobs]

Prints per-stage-name total wall (submission->completion), task time,
and counts, sorted by total wall — the "where did this query's seconds
go" breakdown the UI would show, recovered from the JSON event log
(spark.eventLog.enabled=true) since the bench runs with the UI off.
"""
import json, sys, os
from collections import defaultdict

def each_event(path):
    files = []
    if os.path.isdir(path):
        for root, _dirs, fnames in os.walk(path):
            for f in sorted(fnames):
                if not f.startswith('.') and 'appstatus' not in f:
                    files.append(os.path.join(root, f))
    else:
        files = [path]
    for f in files:
        with open(f, errors='replace') as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(ev, dict):
                    yield ev

def main():
    path = sys.argv[1]
    show_jobs = '--jobs' in sys.argv
    stage_wall = defaultdict(float)
    stage_cnt = defaultdict(int)
    stage_tasks = defaultdict(int)
    jobs = []
    job_start = {}
    for ev in each_event(path):
        e = ev.get('Event')
        if e == 'SparkListenerStageCompleted':
            si = ev['Stage Info']
            name = si.get('Stage Name', '?')
            sub = si.get('Submission Time')
            comp = si.get('Completion Time')
            if sub and comp:
                stage_wall[name] += (comp - sub) / 1000.0
                stage_cnt[name] += 1
                stage_tasks[name] += si.get('Number of Tasks', 0)
        elif e == 'SparkListenerJobStart':
            jid = ev['Job ID']
            props = ev.get('Properties') or {}
            desc = props.get('spark.job.description') or props.get(
                'callSite.short', '?')
            job_start[jid] = (ev.get('Submission Time', 0), desc)
        elif e == 'SparkListenerJobEnd':
            jid = ev['Job ID']
            if jid in job_start:
                t0, desc = job_start[jid]
                jobs.append((jid, (ev.get('Completion Time', 0) - t0) / 1000.0,
                             desc))
    total = sum(stage_wall.values())
    print(f"total stage wall {total:.1f}s over {sum(stage_cnt.values())} stages")
    for name in sorted(stage_wall, key=lambda n: -stage_wall[n])[:40]:
        print(f"{stage_wall[name]:8.2f}s  n={stage_cnt[name]:<4d} "
              f"tasks={stage_tasks[name]:<6d} {name[:120]}")
    if show_jobs:
        print("\njobs by duration:")
        for jid, dur, desc in sorted(jobs, key=lambda j: -j[1])[:40]:
            print(f"{dur:8.2f}s  job={jid:<5d} {desc[:120]}")

if __name__ == '__main__':
    main()
