#!/bin/bash
# CLI-level end-to-end gate for the assembled agent — ALL FOUR standing
# stores (round-14 verdict #3; round-13 shipped the IVF-only flow):
#   conf.d -> GraftMain (log pipeline + ivf + bm25 + packed + curation)
#   -> records land -> admin-socket drain-stop (exit 0)
#   -> CompactTool folds every store (epoch=-1 / batch=-1 only)
#   -> restart on the same checkpoints -> more input resumes on top of
#      compacted state (curation dedup memory SPANS the restart) -> drain
#   -> audit-count oracle (the reference's self-verifying e2e check,
#      e2e/SingerEndToEndTest.java:26-121) + per-store completeness
#   -> right to be forgotten on ALL FOUR stores (ForgetTool -> mask
#      oracle -> CompactTool -> purge/parity oracle; curation also erases
#      the dedup FINGERPRINTS)
#   -> layout maintenance on the at-rest state: CompactTool ivf-refit +
#      bm25-rebucket, with search-parity oracles
#   -> third agent run on the SAME checkpoints: every pipeline appends on
#      top of refit/rebucketed/compacted state; a re-submission of the
#      ERASED curation content is ADMITTED (the RTBF re-admission law)
# Run from the repo root: bash tools/e2e_cli.sh   (exit 0 = gate green)
set -euo pipefail
cd "$(dirname "$0")/.."

BASE=/tmp/graft-e2e
rm -rf "$BASE"
mkdir -p "$BASE/logs/thrift" "$BASE/emb-in" "$BASE/doc-in" "$BASE/tok-in" \
  "$BASE/cur-in" "$BASE/conf.d" "$BASE/audit"

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

# ---- inputs: 1000 framed thrift records, 100 embeddings + frozen
# centroids (+ refit centroids), 40 lexical docs, 50 packed rows, 20
# curation docs (doc 5 carries the text whose fingerprint the RTBF leg
# erases and re-admits)
$JAVA graft.ThriftLogGen "$BASE/logs/thrift/app.log" 1000 2>/dev/null
python3 - "$BASE" <<'EOF'
import sys, json, math, pyarrow as pa, pyarrow.parquet as pq
base = sys.argv[1]
def vec(i): return [float(math.sin(i*31 + j*7) + 2.0) for j in range(8)]
def cents(seed, path):
    t = pa.table({
        "centroid_id": pa.array(range(8), type=pa.int32()),
        "centroid_vec": pa.array([vec(i*seed + 1) for i in range(8)],
                                 type=pa.list_(pa.float32()))})
    pq.write_table(t, path)
cents(10, base + "/centroids.parquet")
cents(13, base + "/centroids2.parquet")   # the refit quantizer
with open(base + "/emb-in/batch1.json", "w") as f:
    for i in range(100):
        f.write(json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
words = ["spark", "hash", "window", "join", "scan", "sort", "shuffle", "probe"]
def text(i):
    return " ".join(words[(i*7 + j*5) % len(words)] for j in range(3 + i % 4))
with open(base + "/doc-in/batch1.json", "w") as f:
    for i in range(40):
        f.write(json.dumps({"doc_id": i, "text": text(i)}) + "\n")
with open(base + "/tok-in/batch1.json", "w") as f:
    for i in range(50):
        f.write(json.dumps({"doc_id": i, "token_ids": [i, i+1, i+2]}) + "\n")
ERASED = "the confidential paragraph scheduled for erasure and later resubmission"
with open(base + "/cur-in/batch1.json", "w") as f:
    for i in range(20):
        t = ERASED if i == 5 else f"unique curated document number {i} " + text(i)
        f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
pq.write_table(pa.table({"doc_id": pa.array([999], type=pa.int64()),
    "text": ["benchmark probe phrase never present in the corpus"]}),
    base + "/probes.parquet")
EOF

# ---- pipeline configs: one log pipeline + all four standing stores
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
cat > "$BASE/conf.d/bm25.properties" <<EOF
pipeline.type=bm25
inputDir=$BASE/doc-in
indexPath=$BASE/bm25-index
checkpointDir=$BASE/ckpt/bm25
bm25.nBuckets=8
EOF
cat > "$BASE/conf.d/packed.properties" <<EOF
pipeline.type=packed
inputDir=$BASE/tok-in
packedDir=$BASE/packed-corpus
checkpointDir=$BASE/ckpt/packed
EOF
cat > "$BASE/conf.d/curation.properties" <<EOF
pipeline.type=curation
inputDir=$BASE/cur-in
probesPath=$BASE/probes.parquet
stateDir=$BASE/cur-state
checkpointDir=$BASE/ckpt/curation
curation.minQuality=0.0
EOF

start_agent() {  # $1 = log suffix
  GRAFT_ADMIN_SOCKET="$BASE/admin.sock" \
    $JAVA graft.GraftMain "$BASE/conf.d" "$BASE/audit" "$BASE/heartbeat.jsonl" \
    > "$BASE/agent$1.log" 2>&1 &
  AGENT_PID=$!
}

wait_counts() {  # thrift rows, distinct vec_ids, bm25 docs, curation verdicts
  python3 - "$BASE" "$1" "$2" "$3" "$4" <<'EOF'
import sys, time, duckdb
base = sys.argv[1]
want = [int(a) for a in sys.argv[2:6]]
probes = [
    f"SELECT count(*) FROM '{base}/out/thrift/*/*.parquet'",
    "SELECT count(DISTINCT vec_id) FROM parquet_scan("
    f"'{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1)",
    "SELECT count(DISTINCT doc_id) FROM parquet_scan("
    f"'{base}/bm25-index/postings/*/*/*.parquet', hive_partitioning=1)",
    "SELECT count(*) FROM parquet_scan("
    f"'{base}/cur-state/verdicts/*/*.parquet', hive_partitioning=1)",
]
deadline = time.time() + 300
got = [-1] * 4
last_exc = None
while time.time() < deadline:
    # independent probes on FRESH connections (duckdb: one failed glob
    # aborts the implicit connection's transaction); a transient miss on
    # one (epoch overwrite window) must not mask another's progress.
    # KEEP the connection in a local — a chained connect().sql() can be
    # GC'd mid-query ("Connection has already been closed")
    for i, q in enumerate(probes):
        con = duckdb.connect()
        try:
            got[i] = con.sql(q).fetchone()[0]
        except Exception as e:
            last_exc = e
        finally:
            con.close()
    if got == want:
        print(f"landed: thrift={got[0]} vecs={got[1]} bm25_docs={got[2]} "
              f"verdicts={got[3]}")
        sys.exit(0)
    time.sleep(3)
print(f"TIMEOUT: got={got} want={want} last_exc={last_exc!r}")
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

probe_bm25() { $JAVA graft.ProbeTool bm25 "$BASE/bm25-index" 5 spark probe 2>/dev/null; }
probe_packed() { $JAVA graft.ProbeTool packed "$BASE/packed-corpus" 2>/dev/null; }

# ---- phase 1: boot all five pipelines, land, drain
echo "== phase 1: start agent (log + ivf + bm25 + packed + curation)"
start_agent 1
wait_counts 1000 100 40 20
drain_stop
wait "$AGENT_PID"
echo "agent exit code: $? (phase 1)"
probe_packed | tee "$BASE/packed_p1.txt"
grep -q "sequences=50" "$BASE/packed_p1.txt"
probe_bm25 > "$BASE/bm25_p1.txt"
echo "bm25 probe (phase 1): $(cat "$BASE/bm25_p1.txt" | tr '\n' ';')"

# ---- maintenance: compact EVERY standing store while stopped
echo "== compaction x4 (stopped pipelines)"
for kind in ivf bm25 packed curation; do
  case $kind in
    ivf) path=$BASE/ivf-index;; bm25) path=$BASE/bm25-index;;
    packed) path=$BASE/packed-corpus;; curation) path=$BASE/cur-state;;
  esac
  $JAVA graft.CompactTool $kind "$path" 2>&1 | grep -v INFO | tail -1
done
python3 - "$BASE" <<'EOF'
import sys, os
base = sys.argv[1]
def only(d, want):
    subs = sorted(x for x in os.listdir(d) if os.path.isdir(d + "/" + x))
    assert subs == [want], f"{d} not fully compacted: {subs}"
only(base + "/ivf-index/corpus", "epoch=-1")
only(base + "/bm25-index/postings", "epoch=-1")
only(base + "/bm25-index/stats", "epoch=-1")
only(base + "/packed-corpus", "epoch=-1")
for sub in ("digests", "sigs", "verdicts"):
    only(base + "/cur-state/" + sub, "batch=-1")
print("compacted: every store holds only its folded epoch")
EOF
probe_bm25 > "$BASE/bm25_p1c.txt"
diff "$BASE/bm25_p1.txt" "$BASE/bm25_p1c.txt" \
  && echo "bm25 compact parity OK (scores identical)"
probe_packed | grep -q "sequences=50" && echo "packed compact parity OK"

# ---- phase 2: more input, restart on the same checkpoints, resume —
# the curation batch includes doc 120 REPEATING doc 5's text: the dedup
# memory must span both the restart and the compaction
echo "== phase 2: restart + resume on compacted state"
$JAVA graft.ThriftLogGen "$BASE/logs/thrift/app.log.1" 500 2>/dev/null
python3 - "$BASE" <<'EOF'
import sys, json, math
base = sys.argv[1]
def vec(i): return [float(math.sin(i*31 + j*7) + 2.0) for j in range(8)]
with open(base + "/emb-in/batch2.json", "w") as f:
    for i in range(100, 150):
        f.write(json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
words = ["spark", "hash", "window", "join", "scan", "sort", "shuffle", "probe"]
def text(i):
    return " ".join(words[(i*7 + j*5) % len(words)] for j in range(3 + i % 4))
with open(base + "/doc-in/batch2.json", "w") as f:
    for i in range(40, 60):
        f.write(json.dumps({"doc_id": i, "text": text(i)}) + "\n")
with open(base + "/tok-in/batch2.json", "w") as f:
    for i in range(50, 70):
        f.write(json.dumps({"doc_id": i, "token_ids": [i, i+1, i+2]}) + "\n")
ERASED = "the confidential paragraph scheduled for erasure and later resubmission"
with open(base + "/cur-in/batch2.json", "w") as f:
    f.write(json.dumps({"doc_id": 120, "text": ERASED}) + "\n")
    for i in range(121, 130):
        f.write(json.dumps({"doc_id": i, "text": f"fresh second-wave doc {i} " + text(i)}) + "\n")
EOF
start_agent 2
wait_counts 1500 150 60 30
drain_stop
wait "$AGENT_PID"
echo "agent exit code: $? (phase 2)"

# ---- the audit-count oracle + per-store completeness + dedup memory
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
# the dedup memory spans compaction AND restart: doc 120 re-sent doc 5's
# text and must be verdicted exact_dup, not kept
v120 = duckdb.sql(
    "SELECT stage FROM parquet_scan("
    f"'{base}/cur-state/verdicts/*/*.parquet', hive_partitioning=1) "
    "WHERE doc_id=120").fetchone()[0]
assert v120 == "exact_dup", f"doc 120 must dedup against doc 5: {v120!r}"
hb = sum(1 for _ in open(base + "/heartbeat.jsonl"))
assert hb > 0, "heartbeat side-channel is empty"
print(f"AUDIT-COUNT ORACLE OK: produced={produced} audited={audited} "
      f"vectors={vecs[0]} epochs={epochs} v120={v120} heartbeats={hb}")
EOF

# ---- phase 3: right to be forgotten on ALL FOUR stores
echo "== phase 3: right to be forgotten (ForgetTool + CompactTool x4)"
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
print(f"IVF FORGET ORACLE OK: vectors={vecs[0]} forgotten_ids_present={gone}")
EOF
# bm25: forget the probe's TOP document -> masked immediately -> compact
# purges -> the post-compact result ids equal the post-forget ids
probe_bm25 > "$BASE/bm25_pre.txt"
TOPDOC=$(head -1 "$BASE/bm25_pre.txt" | cut -d' ' -f2)
$JAVA graft.ForgetTool bm25 "$BASE/bm25-index" "$TOPDOC" 2>&1 | grep -v INFO | tail -1
probe_bm25 > "$BASE/bm25_masked.txt"
if grep -q " $TOPDOC " "$BASE/bm25_masked.txt"; then
  echo "FAIL: forgotten doc $TOPDOC still ranked"; exit 1
fi
$JAVA graft.CompactTool bm25 "$BASE/bm25-index" 2>&1 | grep -v INFO | tail -1
test ! -e "$BASE/bm25-index/tombstones" || { echo "FAIL: bm25 tombstones not retired"; exit 1; }
probe_bm25 > "$BASE/bm25_purged.txt"
diff <(cut -d' ' -f2 "$BASE/bm25_masked.txt") <(cut -d' ' -f2 "$BASE/bm25_purged.txt") \
  && echo "BM25 FORGET ORACLE OK: doc $TOPDOC masked==purged result ids"
# packed: forget two ids -> masked counts -> compact purges + retires
$JAVA graft.ForgetTool packed "$BASE/packed-corpus" 3,66 2>&1 | grep -v INFO | tail -1
probe_packed | grep -q "sequences=68" || { echo "FAIL: packed mask"; exit 1; }
$JAVA graft.CompactTool packed "$BASE/packed-corpus" 2>&1 | grep -v INFO | tail -1
test ! -e "$BASE/packed-corpus/tombstones" || { echo "FAIL: packed tombstones not retired"; exit 1; }
probe_packed | grep -q "sequences=68" && echo "PACKED FORGET ORACLE OK: 70->68 sequences"
# curation: erase doc 5 — content AND fingerprints (doc 120's dup verdict
# rides on doc 5's digest; erasing 5 must re-admit the text later).
# ForgetTool is lease-aware: it must also refuse nothing here (stopped).
$JAVA graft.ForgetTool curation "$BASE/cur-state" 5,120 2>&1 | grep -v INFO | tail -1
$JAVA graft.CompactTool curation "$BASE/cur-state" 2>&1 | grep -v INFO | tail -1
python3 - "$BASE" <<'EOF'
import sys, os, duckdb
base = sys.argv[1]
assert not os.path.exists(base + "/cur-state/tombstones")
n5 = duckdb.sql("SELECT count(*) FROM parquet_scan("
    f"'{base}/cur-state/verdicts/*/*.parquet', hive_partitioning=1) "
    "WHERE doc_id IN (5, 120)").fetchone()[0]
assert n5 == 0, f"erased docs still verdicted: {n5}"
nd = duckdb.sql("SELECT count(*) FROM parquet_scan("
    f"'{base}/cur-state/digests/*/*.parquet', hive_partitioning=1) "
    "WHERE id=5").fetchone()[0]
assert nd == 0, f"erased doc's FINGERPRINT survived compaction: {nd}"
print("CURATION FORGET ORACLE OK: verdicts and fingerprints erased")
EOF

# ---- phase 4: layout maintenance — refit + rebucket while stopped
echo "== phase 4: ivf-refit + bm25-rebucket (stopped pipelines)"
$JAVA graft.CompactTool ivf-refit "$BASE/ivf-index" "$BASE/centroids2.parquet" \
  2>&1 | grep -v INFO | tail -1
python3 - "$BASE" <<'EOF'
import sys, duckdb
base = sys.argv[1]
vecs = duckdb.sql(
    "SELECT count(*), count(DISTINCT vec_id) FROM parquet_scan("
    f"'{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1)").fetchone()
assert vecs == (147, 147), f"refit must re-route all 147 vectors once: {vecs}"
print(f"REFIT ORACLE OK: {vecs[0]} vectors re-routed under the new quantizer")
EOF
$JAVA graft.CompactTool bm25-rebucket "$BASE/bm25-index" 4 2>&1 | grep -v INFO | tail -1
grep -q "^4$" "$BASE/bm25-index/postings/_NBUCKETS" \
  || { echo "FAIL: rebucket did not persist the new count"; exit 1; }
probe_bm25 > "$BASE/bm25_rebkt.txt"
diff "$BASE/bm25_purged.txt" "$BASE/bm25_rebkt.txt" \
  && echo "REBUCKET ORACLE OK: results invariant under the new bucket count"

# ---- phase 5: third agent run on the SAME checkpoints — every pipeline
# appends on top of the maintained state; the erased text is re-admitted
echo "== phase 5: restart on refit/rebucketed state + RTBF re-admission"
python3 - "$BASE" <<'EOF'
import sys, json, math
base = sys.argv[1]
def vec(i): return [float(math.sin(i*31 + j*7) + 2.0) for j in range(8)]
with open(base + "/emb-in/batch3.json", "w") as f:
    for i in range(150, 160):
        f.write(json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
with open(base + "/doc-in/batch3.json", "w") as f:
    f.write(json.dumps({"doc_id": 200, "text": "spark probe spark probe"}) + "\n")
with open(base + "/tok-in/batch3.json", "w") as f:
    f.write(json.dumps({"doc_id": 200, "token_ids": [1, 2]}) + "\n")
ERASED = "the confidential paragraph scheduled for erasure and later resubmission"
with open(base + "/cur-in/batch3.json", "w") as f:
    f.write(json.dumps({"doc_id": 130, "text": ERASED}) + "\n")
EOF
start_agent 3
wait_counts 1500 157 60 29
# ---- maintenance status plane: a held lease is visible in admin status
# and the heartbeat, and clears after (round-15 verdict #4). The lease
# FILE is the protocol, so the probe writes one (a real CompactTool at
# this size releases in milliseconds — too fast to catch over a socket).
python3 - "$BASE" <<'EOF'
import sys, socket, json, time, uuid, os
base = sys.argv[1]
lease = base + "/ivf-index.MAINTENANCE_LEASE"
def status():
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(base + "/admin.sock")
    f = s.makefile()
    s.sendall(b"status\n")
    line = f.readline().strip()
    s.close()
    return json.loads(line)
st = status()
m = st["maintenance"]
assert len(m) == 4, f"want all four standing stores reported: {sorted(m)}"
assert all(not v["lease"] for v in m.values()), f"unexpected lease: {m}"
with open(lease, "w") as fh:
    fh.write(str(uuid.uuid4()) +
             "\nop=compact\nacquiredAtMs=%d\nhost=e2e\n" % int(time.time() * 1000))
try:
    st = status()
    ivf = [v for k, v in st["maintenance"].items() if "ivf" in k][0]
    assert ivf["lease"] and ivf["op"] == "compact", ivf
    assert ivf["host"] == "e2e" and ivf["acquiredAtMs"] > 0, ivf
    deadline = time.time() + 45  # one 10 s monitor tick + slack
    seen = False
    while time.time() < deadline and not seen:
        try:
            seen = any('"event":"maintenance"' in l and '"op":"compact"' in l
                       for l in open(base + "/heartbeat.jsonl"))
        except FileNotFoundError:
            pass
        time.sleep(1)
    assert seen, "no maintenance heartbeat within a monitor tick"
finally:
    os.remove(lease)
st = status()
assert all(not v["lease"] for v in st["maintenance"].values()), "lease must clear"
print("MAINTENANCE STATUS ORACLE OK: lease visible in status + heartbeat, clears after")
EOF
drain_stop
wait "$AGENT_PID"
echo "agent exit code: $? (phase 5)"
python3 - "$BASE" <<'EOF'
import sys, duckdb
base = sys.argv[1]
# the RTBF re-admission law: the erased content re-submitted under a new
# id is KEPT — its fingerprint is truly gone (most pipelines get this
# wrong and keep suppressing erased content forever)
v130 = duckdb.sql("SELECT stage FROM parquet_scan("
    f"'{base}/cur-state/verdicts/*/*.parquet', hive_partitioning=1) "
    "WHERE doc_id=130").fetchone()[0]
assert v130 == "kept", f"re-submitted erased content must be admitted: {v130!r}"
# the bm25 pipeline RESOLVED the rebucketed count from the store (conf
# still says 8): the new epoch's buckets must sit under nBuckets=4
mx = duckdb.sql("SELECT max(bucket) FROM parquet_scan("
    f"'{base}/bm25-index/postings/*/*/*.parquet', hive_partitioning=1)"
).fetchone()[0]
assert mx < 4, f"post-rebucket appends must use the persisted count: max bucket {mx}"
print(f"RE-ADMISSION ORACLE OK: v130={v130}; bm25 max_bucket={mx} (<4)")
EOF
probe_bm25 | head -3
probe_packed | grep -q "sequences=69" && echo "packed resumed: 68+1=69 sequences"

# ---- phase 6: CROSS-STORE right to be forgotten — ONE ForgetTool
# invocation tombstones every store from the conf directory (round-15
# verdict #3); per-store compacts purge. Doc/vec id 8 lives in all four.
echo "== phase 6: ForgetTool all (one invocation, four stores)"
$JAVA graft.ForgetTool all "$BASE/conf.d" 8 2>&1 | grep -v INFO | tail -1
probe_packed | grep -q "sequences=68" || { echo "FAIL: cross-store mask (packed)"; exit 1; }
for kind in ivf bm25 packed curation; do
  case $kind in
    ivf) path=$BASE/ivf-index;; bm25) path=$BASE/bm25-index;;
    packed) path=$BASE/packed-corpus;; curation) path=$BASE/cur-state;;
  esac
  test -e "$path/tombstones" || { echo "FAIL: no tombstones in $kind"; exit 1; }
  $JAVA graft.CompactTool $kind "$path" 2>&1 | grep -v INFO | tail -1
  test ! -e "$path/tombstones" || { echo "FAIL: $kind tombstones not retired"; exit 1; }
done
python3 - "$BASE" <<'EOF'
import sys, duckdb
base = sys.argv[1]
iv = duckdb.sql("SELECT count(*) FROM parquet_scan("
    f"'{base}/ivf-index/corpus/*/*/*.parquet', hive_partitioning=1) "
    "WHERE vec_id = 8").fetchone()[0]
bm = duckdb.sql("SELECT count(*) FROM parquet_scan("
    f"'{base}/bm25-index/postings/*/*/*.parquet', hive_partitioning=1) "
    "WHERE doc_id = 8").fetchone()[0]
cu = duckdb.sql("SELECT count(*) FROM parquet_scan("
    f"'{base}/cur-state/verdicts/*/*.parquet', hive_partitioning=1) "
    "WHERE doc_id = 8").fetchone()[0]
cd = duckdb.sql("SELECT count(*) FROM parquet_scan("
    f"'{base}/cur-state/digests/*/*.parquet', hive_partitioning=1) "
    "WHERE id = 8").fetchone()[0]
assert (iv, bm, cu, cd) == (0, 0, 0, 0), \
    f"id 8 must be purged everywhere: ivf={iv} bm25={bm} verdicts={cu} digests={cd}"
print("CROSS-STORE FORGET ORACLE OK: id 8 purged from all four stores")
EOF
probe_packed | grep -q "sequences=68" || { echo "FAIL: packed purge count"; exit 1; }

# ---- phase 7: snapshot/restore + the FORGET LEDGER (round-15 verdict
# #1): the undo button must not undo a compliance delete. A forget issued
# AFTER the snapshot is ledgered outside the swapped root, so the DEFAULT
# restore re-applies it (the forgotten doc stays masked even though the
# snapshot contains its bytes); the fat-finger case is the EXPLICIT
# --resurrect escape hatch, which restores byte-parity with the
# pre-snapshot probe and ledgers the cancellation.
echo "== phase 7: SnapshotTool snapshot -> forget -> restore (ledger) -> --resurrect"
probe_packed > "$BASE/packed_pre_snap.txt"
$JAVA graft.SnapshotTool snapshot "$BASE/packed-corpus" s1 2>&1 | grep -v INFO | tail -1
$JAVA graft.SnapshotTool list "$BASE/packed-corpus" 2>/dev/null | cut -f1 | grep -qx s1 \
  || { echo "FAIL: snapshot not listed"; exit 1; }
$JAVA graft.ForgetTool packed "$BASE/packed-corpus" 9 2>&1 | grep -v INFO | tail -1
$JAVA graft.CompactTool packed "$BASE/packed-corpus" 2>&1 | grep -v INFO | tail -1
probe_packed | grep -q "sequences=67" || { echo "FAIL: damage not visible"; exit 1; }
# DEFAULT restore: the snapshot HOLDS doc 9's bytes, but the ledgered
# forget rides the swap as a fresh tombstone — RTBF survives the restore
$JAVA graft.SnapshotTool restore "$BASE/packed-corpus" s1 2>&1 | grep -v INFO | tail -1
probe_packed | grep -q "sequences=67" \
  || { echo "FAIL: a ledgered forget must survive the snapshot restore"; exit 1; }
echo "FORGET LEDGER ORACLE OK: doc 9 stayed masked through the restore swap"
# EXPLICIT fat-finger undo: resurrect doc 9 by id -> pre-snapshot parity
$JAVA graft.SnapshotTool restore "$BASE/packed-corpus" s1 --resurrect 9 2>&1 | grep -v INFO | tail -1
probe_packed > "$BASE/packed_restored.txt"
diff "$BASE/packed_pre_snap.txt" "$BASE/packed_restored.txt" \
  && echo "SNAPSHOT/RESTORE ORACLE OK: --resurrect restored probe parity with the pre-snapshot state"

# ---- phase 8: snapshot lifecycle — list reports size/age; delete prunes
# (full-size copies must not accumulate forever; round-15 verdict #6).
echo "== phase 8: SnapshotTool list sizes + delete"
$JAVA graft.SnapshotTool snapshot "$BASE/packed-corpus" s2 2>&1 | grep -v INFO | tail -1
$JAVA graft.SnapshotTool list "$BASE/packed-corpus" 2>/dev/null > "$BASE/snap_list.txt"
awk -F'\t' '$1=="s1" || $1=="s2" { if ($2+0 <= 0 || $3+0 <= 0) exit 1; n++ } END { exit n==2 ? 0 : 1 }' \
  "$BASE/snap_list.txt" || { echo "FAIL: list must report files+bytes for s1 and s2"; exit 1; }
$JAVA graft.SnapshotTool delete "$BASE/packed-corpus" s1 2>&1 | grep -v INFO | tail -1
$JAVA graft.SnapshotTool list "$BASE/packed-corpus" 2>/dev/null | cut -f1 > "$BASE/snap_list2.txt"
grep -qx s1 "$BASE/snap_list2.txt" && { echo "FAIL: deleted snapshot still listed"; exit 1; }
grep -qx s2 "$BASE/snap_list2.txt" || { echo "FAIL: surviving snapshot lost"; exit 1; }
# the survivor still restores (same state as s1 post-resurrect: no-op parity)
$JAVA graft.SnapshotTool restore "$BASE/packed-corpus" s2 2>&1 | grep -v INFO | tail -1
probe_packed > "$BASE/packed_restored2.txt"
diff "$BASE/packed_pre_snap.txt" "$BASE/packed_restored2.txt" \
  && echo "SNAPSHOT LIFECYCLE OK: sizes listed, s1 pruned, s2 restorable"

# ---- phase 9: INCREMENTAL snapshots — an unchanged store increments to
# a pure-pointer snapshot (ownBytes=0); a referenced base refuses delete
# until its dependents are pruned (round 16).
echo "== phase 9: SnapshotTool incremental (--base) + referenced-base refusal"
$JAVA graft.SnapshotTool snapshot "$BASE/packed-corpus" s3 2>&1 | grep -v INFO | tail -1
$JAVA graft.SnapshotTool snapshot "$BASE/packed-corpus" s4 --base s3 2>&1 | grep -v INFO | tail -1
$JAVA graft.SnapshotTool list "$BASE/packed-corpus" 2>/dev/null > "$BASE/snap_list3.txt"
awk -F'\t' '$1=="s3" { if ($4+0 != $3+0 || $3+0 <= 0) exit 1; ok++ }
            $1=="s4" { if ($4+0 != 0 || $3+0 <= 0) exit 1; ok++ }
            END { exit ok==2 ? 0 : 1 }' "$BASE/snap_list3.txt" \
  || { echo "FAIL: s4 must be a pure-pointer increment of s3 (ownBytes=0)"; exit 1; }
if $JAVA graft.SnapshotTool delete "$BASE/packed-corpus" s3 >/dev/null 2>&1; then
  echo "FAIL: deleting a referenced base must refuse"; exit 1
fi
$JAVA graft.SnapshotTool verify "$BASE/packed-corpus" s4 2>&1 | grep -q "verified:" \
  || { echo "FAIL: verify must fsck s4's pointer chain green"; exit 1; }
$JAVA graft.SnapshotTool restore "$BASE/packed-corpus" s4 2>&1 | grep -v INFO | tail -1
probe_packed > "$BASE/packed_restored3.txt"
diff "$BASE/packed_pre_snap.txt" "$BASE/packed_restored3.txt" \
  || { echo "FAIL: pointer-resolved restore must match the captured state"; exit 1; }
$JAVA graft.SnapshotTool delete "$BASE/packed-corpus" s4 2>&1 | grep -v INFO | tail -1
$JAVA graft.SnapshotTool delete "$BASE/packed-corpus" s3 2>&1 | grep -v INFO | tail -1
echo "INCREMENTAL SNAPSHOT OK: pure-pointer increment, refusal while referenced, chain restore parity"
echo "E2E CLI GATE: PASS"