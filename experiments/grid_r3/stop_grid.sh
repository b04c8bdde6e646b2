#!/bin/bash
# Cleanly stop the round-3 grid: the wrapper bash (grid.pid), the
# workflow_driver it spawned, and the bo.py cell child — by EXACT pid
# walk (never by name pattern).  Pids are captured FIRST, then killed
# top-down (wrapper → driver → cell) so the driver's retry loop cannot
# respawn a cell between kills.  The interrupted cell remains
# restartable via the --restart contract.
set -u
if [ -f /tmp/grid.pid ]; then
    root=$(cat /tmp/grid.pid)
    drivers=$(ps -o pid= --ppid "$root" 2>/dev/null || true)
    cells=""
    for d in $drivers; do
        cells="$cells $(ps -o pid= --ppid "$d" 2>/dev/null || true)"
    done
    echo "wrapper=$root drivers=$drivers cells=$cells"
    kill "$root" 2>/dev/null
    for d in $drivers; do kill "$d" 2>/dev/null; done
    sleep 2
    for c in $cells; do kill "$c" 2>/dev/null; done
fi
sleep 5
left=$(ps aux | grep -E "bo\.py|workflow_driver" | grep -v grep || true)
if [ -n "$left" ]; then
    echo "STILL RUNNING (escalate with kill -9 <pid> manually):"
    echo "$left"
else
    echo "grid stopped; chip free"
fi
