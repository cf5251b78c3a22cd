#!/bin/bash
# CLI-level end-to-end gate for the assembled agent (round-13 verdict #6):
#   config files -> GraftMain (log pipeline + standing IVF data pipeline)
#   -> records land -> admin-socket drain-stop (exit 0)
#   -> CompactTool folds the standing index (epoch=-1 only)
#   -> restart on the same checkpoints -> more input resumes on top of
#      compacted state -> drain-stop again
#   -> audit-count oracle: the audit side-channel total equals the rows
#      that actually landed (the reference's self-verifying e2e check,
#      e2e/SingerEndToEndTest.java:26-121), plus index completeness.
# Run from the repo root: bash tools/e2e_cli.sh   (exit 0 = gate green)
set -euo pipefail
cd "$(dirname "$0")/.."

BASE=/tmp/graft-e2e
rm -rf "$BASE"
mkdir -p "$BASE/logs/thrift" "$BASE/emb-in" "$BASE/conf.d" "$BASE/audit"

# ---- classpath + JDK17 opens (build.sbt's fork settings, for bare java)
if [ ! -s /tmp/graft_cp.txt ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1 > /tmp/graft_cp.txt
fi
CP=$(cat /tmp/graft_cp.txt)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA="java $OPENS -cp $CP -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Dspark.sql.shuffle.partitions=8 \
  -Dspark.master=local[8]"

# ---- inputs: 1000 framed thrift records + 100 embeddings + frozen centroids
$JAVA graft.ThriftLogGen "$BASE/logs/thrift/app.log" 1000 2>/dev/null
python3 - "$BASE" <<'EOF'
import sys, json, math, pyarrow as pa, pyarrow.parquet as pq
base = sys.argv[1]
def vec(i): return [float(math.sin(i*31 + j*7) + 2.0) for j in range(8)]
cents = pa.table({
    "centroid_id": pa.array(range(8), type=pa.int32()),
    "centroid_vec": pa.array([vec(i) for i in range(8)],
                             type=pa.list_(pa.float32()))})
pq.write_table(cents, base + "/centroids.parquet")
with open(base + "/emb-in/batch1.json", "w") as f:
    for i in range(100):
        f.write(json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
EOF

# ---- pipeline configs: one log pipeline, one standing data pipeline
cat > "$BASE/conf.d/app_thrift.properties" <<EOF
logDir=$BASE/logs/thrift
logStreamRegex=app\\.log.*
reader.type=thrift
writer.type=file
writer.file.path=$BASE/out/thrift
checkpointDir=$BASE/ckpt/thrift
EOF
cat > "$BASE/conf.d/ivf.properties" <<EOF
pipeline.type=ivf
inputDir=$BASE/emb-in
indexPath=$BASE/ivf-index
checkpointDir=$BASE/ckpt/ivf
centroidsPath=$BASE/centroids.parquet
EOF

start_agent() {  # $1 = log suffix
  GRAFT_ADMIN_SOCKET="$BASE/admin.sock" \
    $JAVA graft.GraftMain "$BASE/conf.d" "$BASE/audit" "$BASE/heartbeat.jsonl" \
    > "$BASE/agent$1.log" 2>&1 &
  AGENT_PID=$!
}

wait_counts() {  # $1 = expected thrift rows, $2 = expected distinct vec_ids
  python3 - "$BASE" "$1" "$2" <<'EOF'
import sys, time, duckdb
base, want_rows, want_vecs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
deadline = time.time() + 240
rows = vecs = -1
last_exc = None
while time.time() < deadline:
    # independent probes on a FRESH connection each (duckdb 1.0.0: one
    # failed glob aborts the implicit connection's transaction and every
    # later query on it fails until ROLLBACK); a transient miss on one
    # probe (epoch overwrite window, not-yet-created dir) must not mask
    # the other's progress
    con = duckdb.connect()
    try:
        rows = con.sql(
            f"SELECT count(*) FROM '{base}/out/thrift/*/*.parquet'").fetchone()[0]
    except Exception as e:
        last_exc = e
    con = duckdb.connect()
    try:
        vecs = con.sql(
            "SELECT count(DISTINCT vec_id) FROM "
            f"parquet_scan('{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1)"
        ).fetchone()[0]
    except Exception as e:
        last_exc = e
    if rows == want_rows and vecs == want_vecs:
        print(f"landed: thrift_rows={rows} distinct_vecs={vecs}")
        sys.exit(0)
    time.sleep(3)
print(f"TIMEOUT: thrift_rows={rows} (want {want_rows}) "
      f"distinct_vecs={vecs} (want {want_vecs}) last_exc={last_exc!r}")
sys.exit(1)
EOF
}

drain_stop() {
  python3 - "$BASE" <<'EOF'
import sys, socket, time
base = sys.argv[1]
deadline = time.time() + 60
while True:
    try:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(base + "/admin.sock"); break
    except OSError:
        if time.time() > deadline: raise
        time.sleep(1)
f = s.makefile()
s.sendall(b"status\n"); print("admin status:", f.readline().strip()[:160])
s.sendall(b"stop\n")
resp = f.readline().strip()
print("admin stop:", resp)
assert resp == "done", f"drain-stop must ack 'done', got {resp!r}"
EOF
}

# ---- phase 1: boot, land, drain
echo "== phase 1: start agent"
start_agent 1
wait_counts 1000 100
drain_stop
wait "$AGENT_PID"
echo "agent exit code: $? (phase 1)"

# ---- maintenance: compact the standing index while stopped
echo "== compaction (stopped pipeline)"
$JAVA graft.CompactTool ivf "$BASE/ivf-index" 2>&1 | grep -v INFO | tail -1
python3 - "$BASE" <<'EOF'
import sys, os
base = sys.argv[1]
subs = sorted(d for d in os.listdir(base + "/ivf-index/corpus")
              if os.path.isdir(base + "/ivf-index/corpus/" + d))
assert subs == ["epoch=-1"], f"corpus not fully compacted: {subs}"
print("compacted: corpus holds only epoch=-1")
EOF

# ---- phase 2: more input, restart on the same checkpoints, resume
echo "== phase 2: restart + resume on compacted state"
$JAVA graft.ThriftLogGen "$BASE/logs/thrift/app.log.1" 500 2>/dev/null
python3 - "$BASE" <<'EOF'
import sys, json, math
base = sys.argv[1]
def vec(i): return [float(math.sin(i*31 + j*7) + 2.0) for j in range(8)]
with open(base + "/emb-in/batch2.json", "w") as f:
    for i in range(100, 150):
        f.write(json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
EOF
start_agent 2
wait_counts 1500 150
drain_stop
wait "$AGENT_PID"
echo "agent exit code: $? (phase 2)"

# ---- the audit-count oracle + post-compaction layout
python3 - "$BASE" <<'EOF'
import sys, os, duckdb
base = sys.argv[1]
produced = duckdb.sql(
    f"SELECT count(*) FROM '{base}/out/thrift/*/*.parquet'").fetchone()[0]
audited = duckdb.sql(
    "SELECT sum(num_messages) FROM parquet_scan("
    f"'{base}/audit/pipeline=app_thrift/*/*.parquet', hive_partitioning=1)"
).fetchone()[0]
assert produced == 1500, f"produced {produced} != 1500"
assert audited == produced, f"audit says {audited}, landed {produced}"
vecs = duckdb.sql(
    "SELECT count(DISTINCT vec_id), count(*) FROM parquet_scan("
    f"'{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1)").fetchone()
assert vecs == (150, 150), f"index must hold 150 unique vectors once: {vecs}"
epochs = sorted(d for d in os.listdir(base + "/ivf-index/corpus")
                if d.startswith("epoch="))
assert "epoch=-1" in epochs and len(epochs) >= 2, \
    f"resume must append fresh epochs next to the compacted one: {epochs}"
hb = sum(1 for _ in open(base + "/heartbeat.jsonl"))
assert hb > 0, "heartbeat side-channel is empty"
print(f"AUDIT-COUNT ORACLE OK: produced={produced} audited={audited} "
      f"vectors={vecs[0]} epochs={epochs} heartbeats={hb}")
EOF
# ---- phase 3: right to be forgotten at the CLI (stopped pipeline)
#   ForgetTool tombstones ids -> CompactTool purges the bytes and
#   retires the tombstone store -> the at-rest corpus reads as if the
#   ids never landed
echo "== phase 3: right to be forgotten (ForgetTool + CompactTool)"
$JAVA graft.ForgetTool ivf "$BASE/ivf-index" 42,77,107 2>&1 | grep -v INFO | tail -1
$JAVA graft.CompactTool ivf "$BASE/ivf-index" 2>&1 | grep -v INFO | tail -1
python3 - "$BASE" <<'EOF'
import sys, os, duckdb
base = sys.argv[1]
assert not os.path.exists(base + "/ivf-index/tombstones"), \
    "compaction must retire the applied tombstone store"
subs = sorted(d for d in os.listdir(base + "/ivf-index/corpus")
              if d.startswith("epoch="))
assert subs == ["epoch=-1"], f"corpus not fully compacted: {subs}"
vecs = duckdb.sql(
    "SELECT count(*), count(DISTINCT vec_id) FROM parquet_scan("
    f"'{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1)").fetchone()
assert vecs == (147, 147), f"purge must leave 147 vectors exactly: {vecs}"
gone = duckdb.sql(
    "SELECT count(*) FROM parquet_scan("
    f"'{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1) "
    "WHERE vec_id IN (42, 77, 107)").fetchone()[0]
assert gone == 0, f"forgotten ids still present in the at-rest bytes: {gone}"
print(f"FORGET ORACLE OK: vectors={vecs[0]} forgotten_ids_present={gone}")
EOF
echo "E2E CLI GATE: PASS"
