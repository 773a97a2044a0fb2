#!/usr/bin/env bash
# Recover the flow-phase metrics CSV whose dentry was unlinked while the
# trainer (pid $1, fd $2) still writes to it: snapshot the open fd back to
# the expected path every 60 s until the process exits.
PID="${1:?pid}"; FD="${2:?fd}"; DEST="${3:?dest}"
while [ -d "/proc/$PID" ]; do
    cat "/proc/$PID/fd/$FD" > "$DEST" 2>/dev/null
    sleep 60
done
cat "/proc/$PID/fd/$FD" > "$DEST" 2>/dev/null   # final (usually fails; best effort)
exit 0
