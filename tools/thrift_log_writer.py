#!/usr/bin/env python3
"""Python client producer for the framed-thrift log format — the analog of
graft.sources.ThriftLogWriter for Python applications (the reference ships a
thrift-logger-python/ client next to its Java one; this is the engine's
equivalent surface).

Framing is byte-identical to ThriftLogCodec.encodeFrame (Scala), pinned by
ThriftLogWriterSpec's cross-language fixture:

  frame   := i32 length, struct          (big-endian)
  struct  := (field)* stop
  field   := byte type, i16 id, value
  binary  := i32 length, bytes           (type 11)
  i64     := 8 bytes big-endian          (type 10)

LogMessage fields: 1=key(binary,optional), 2=message(binary,required),
3=timestampInNanos(i64,optional), 4=checksum(i64,optional; CRC32 of the
message bytes, matching Transforms.withChecksum).

Pure stdlib; single-writer per (dir, topic) by contract, like the Scala
writer. Rotation renames <topic>.log to <topic>.log.<seq> when a frame
would push it past the threshold; retention deletes rotated files older
than retention_secs after each rotation.

CLI:
  python3 tools/thrift_log_writer.py <dir> <topic>            # frames stdin lines
  python3 tools/thrift_log_writer.py --selftest <dir> <topic> # deterministic fixture
"""
import os
import struct
import sys
import time
import zlib

T_STOP = 0
T_I64 = 10
T_BINARY = 11


def encode_frame(key, message, timestamp_nanos=None, checksum=None):
    """Byte-identical twin of ThriftLogCodec.encodeFrame."""
    body = bytearray()
    if key is not None:
        body += struct.pack(">bh", T_BINARY, 1)
        body += struct.pack(">i", len(key)) + key
    body += struct.pack(">bh", T_BINARY, 2)
    body += struct.pack(">i", len(message)) + message
    if timestamp_nanos is not None:
        body += struct.pack(">bhq", T_I64, 3, timestamp_nanos)
    if checksum is not None:
        # CRC32 is an unsigned 32-bit value; the wire field is i64
        body += struct.pack(">bhq", T_I64, 4, checksum)
    body.append(T_STOP)
    return struct.pack(">i", len(body)) + bytes(body)


class ThriftLogWriter:
    def __init__(self, base_dir, topic, rotation_threshold_bytes=64 << 20,
                 retention_secs=3 * 86400, now_ms=None):
        if rotation_threshold_bytes <= 0:
            raise ValueError("rotation_threshold_bytes must be positive")
        self.base_dir = base_dir
        self.topic = topic
        self.rotation_threshold_bytes = rotation_threshold_bytes
        self.retention_secs = retention_secs
        self.now_ms = now_ms or (lambda: int(time.time() * 1000))
        os.makedirs(base_dir, exist_ok=True)
        self.current = os.path.join(base_dir, f"{topic}.log")
        self.size = os.path.getsize(self.current) if os.path.exists(self.current) else 0
        self.out = open(self.current, "ab")

    def append(self, message, time_nanos, key=None):
        frame = encode_frame(key if key is not None else b"", message,
                             timestamp_nanos=time_nanos,
                             checksum=zlib.crc32(message))
        if self.size > 0 and self.size + len(frame) > self.rotation_threshold_bytes:
            self._rotate()
        self.out.write(frame)
        self.out.flush()
        self.size += len(frame)

    def _rotated_seq(self):
        prefix = f"{self.topic}.log."
        seqs = [int(n[len(prefix):]) for n in os.listdir(self.base_dir)
                if n.startswith(prefix) and n[len(prefix):].isdigit()]
        return (max(seqs) if seqs else 0) + 1

    def _rotate(self):
        self.out.close()
        os.rename(self.current,
                  os.path.join(self.base_dir, f"{self.topic}.log.{self._rotated_seq()}"))
        self.out = open(self.current, "ab")
        self.size = 0
        self._enforce_retention()

    def _enforce_retention(self):
        cutoff = self.now_ms() - self.retention_secs * 1000
        prefix = f"{self.topic}.log."
        for n in os.listdir(self.base_dir):
            if n.startswith(prefix):
                p = os.path.join(self.base_dir, n)
                if os.path.getmtime(p) * 1000 < cutoff:
                    os.remove(p)

    def close(self):
        self.out.close()


def _selftest(base_dir, topic):
    """Deterministic fixture consumed by ThriftLogWriterSpec: known keys,
    messages, and timestamps, including a no-key record and a unicode
    message. The Scala side decodes the file, checks values and CRCs, and
    re-encodes to assert byte identity."""
    w = ThriftLogWriter(base_dir, topic)
    w.append(b"hello from python", 1_000_000_001, key=b"k0")
    w.append("snowman ☃ payload".encode("utf-8"), 2_000_000_002, key=b"key-1")
    w.append(b"", 3_000_000_003, key=b"k2")          # empty message, valid
    w.append(b"no key record", 4_000_000_004)        # empty key (Scala: null -> empty)
    w.append(bytes(range(256)), 5_000_000_005, key=b"binary")
    w.close()
    print(os.path.join(base_dir, f"{topic}.log"))


def main():
    args = sys.argv[1:]
    if args and args[0] == "--selftest":
        _selftest(args[1], args[2])
        return
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    w = ThriftLogWriter(args[0], args[1])
    try:
        for line in sys.stdin.buffer:
            w.append(line.rstrip(b"\n"), time.time_ns())
    finally:
        w.close()


if __name__ == "__main__":
    main()
