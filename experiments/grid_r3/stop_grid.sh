#!/bin/bash
# Cleanly stop the round-3 grid: the wrapper bash (grid.pid), the
# workflow_driver it spawned, and the bo.py cell child — by EXACT pid
# walk (never by name pattern).  The interrupted cell remains
# restartable via the --restart contract.
set -u
if [ -f /tmp/grid.pid ]; then
    root=$(cat /tmp/grid.pid)
    # children first (workflow_driver), then their bo.py children
    for d in $(ps -o pid= --ppid "$root" 2>/dev/null); do
        for c in $(ps -o pid= --ppid "$d" 2>/dev/null); do
            echo "kill bo.py child $c"; kill "$c" 2>/dev/null
        done
        echo "kill driver $d"; kill "$d" 2>/dev/null
    done
    echo "kill wrapper $root"; kill "$root" 2>/dev/null
fi
sleep 5
left=$(ps aux | grep -E "bo\.py|workflow_driver" | grep -v grep || true)
if [ -n "$left" ]; then
    echo "STILL RUNNING (escalate with kill -9 <pid> manually):"
    echo "$left"
else
    echo "grid stopped; chip free"
fi
