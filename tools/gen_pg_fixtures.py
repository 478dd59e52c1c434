#!/usr/bin/env python3
"""Generate pgoutput / COPY-BOTH conformance fixtures.

Assembles raw byte streams DIRECTLY from the public PostgreSQL protocol
documentation ("Logical Replication Message Formats" and "Message
Formats", protocol 3.0) using struct packing — deliberately independent
of the Scala codec (graft.sources.PgOutput), so a bug where our encoder
and decoder agree with each other but not with the spec is caught by
the fixture-driven tests (PgConformanceSpec).

Outputs (checked into the repo; regenerate only when adding cases):
  src/test/resources/pgoutput_frames.txt   name\thex  (one frame each)
  src/test/resources/copyboth_session.txt  step\thex  (server byte blobs)
"""
import struct, os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")

def be16(v): return struct.pack(">h", v)
def be32(v): return struct.pack(">i", v)
def be64(v): return struct.pack(">q", v)
def u8(v):   return struct.pack(">B", v)
def cstr(s): return s.encode("utf-8") + b"\x00"

def text_cell(s):
    b = s.encode("utf-8")
    return b"t" + be32(len(b)) + b
def bin_cell(raw):
    return b"b" + be32(len(raw)) + raw
NULL_CELL  = b"n"
TOAST_CELL = b"u"

def tuple_data(*cells):
    return be16(len(cells)) + b"".join(cells)

# deterministic protocol timestamp: microseconds since 2000-01-01
TS = 820292645000000

# ---------------------------------------------------------------- frames
frames = []

def frame(name, payload):
    frames.append((name, payload))

# Begin: Int64 final LSN, Int64 commit ts, Int32 xid
frame("begin", b"B" + be64(0x16B3748) + be64(TS) + be32(777))
# Commit: Int8 flags, Int64 commit LSN, Int64 end LSN, Int64 ts
frame("commit", b"C" + u8(0) + be64(0x16B3748) + be64(0x16B3800) + be64(TS))
# Origin: Int64 origin commit LSN, String name
frame("origin", b"O" + be64(0x1111) + cstr("region_a"))
# Relation: Int32 relid, String ns, String relname, Int8 replident,
#           Int16 ncols, [Int8 flags, String name, Int32 oid, Int32 typmod]
REL = (b"R" + be32(16384) + cstr("public") + cstr("users") + u8(ord("d")) +
       be16(3) +
       u8(1) + cstr("id") + be32(23) + be32(-1) +
       u8(0) + cstr("name") + be32(25) + be32(-1) +
       u8(0) + cstr("bio") + be32(25) + be32(-1))
frame("relation", REL)
# Type: Int32 oid, String ns, String name
frame("type", b"Y" + be32(3802) + cstr("pg_catalog") + cstr("jsonb"))
# Insert: Int32 relid, Byte1('N'), TupleData
frame("insert_text_null",
      b"I" + be32(16384) + b"N" +
      tuple_data(text_cell("1"), text_cell("alice"), NULL_CELL))
# UTF-8 multi-byte content (2-, 3- and 4-byte sequences)
frame("insert_utf8",
      b"I" + be32(16384) + b"N" +
      tuple_data(text_cell("2"), text_cell("héllo→世界"),
                 text_cell("\U0001F600")))
# binary-mode cells (publication `binary` option): int4 + float8 + raw
frame("insert_binary",
      b"I" + be32(16384) + b"N" +
      tuple_data(bin_cell(struct.pack(">i", 42)),
                 bin_cell(struct.pack(">d", 2.5)),
                 bin_cell(b"\x01\x02\xff")))
# Update, key-image old tuple: relid, 'K' + TupleData, 'N' + TupleData
frame("update_key",
      b"U" + be32(16384) +
      b"K" + tuple_data(text_cell("1"), NULL_CELL, NULL_CELL) +
      b"N" + tuple_data(text_cell("1"), text_cell("alicia"), TOAST_CELL))
# Update, full old row (REPLICA IDENTITY FULL)
frame("update_full",
      b"U" + be32(16384) +
      b"O" + tuple_data(text_cell("1"), text_cell("alice"), NULL_CELL) +
      b"N" + tuple_data(text_cell("1"), text_cell("al"), text_cell("x")))
# Update without old tuple
frame("update_no_old",
      b"U" + be32(16384) +
      b"N" + tuple_data(text_cell("1"), text_cell("a2"), NULL_CELL))
# Delete, key image
frame("delete_key",
      b"D" + be32(16384) + b"K" +
      tuple_data(text_cell("1"), NULL_CELL, NULL_CELL))
# Update where EVERY non-key new cell is unchanged-TOAST and there is no
# old tuple — the widest missing-column mask the decoder can produce
frame("update_toast_multi",
      b"U" + be32(16384) +
      b"N" + tuple_data(text_cell("9"), TOAST_CELL, TOAST_CELL))
# Delete with a FULL old row (REPLICA IDENTITY FULL → 'O')
frame("delete_full",
      b"D" + be32(16384) + b"O" +
      tuple_data(text_cell("3"), text_cell("carol"), text_cell("hi")))
# Truncate: Int32 nrels, Int8 options (1=CASCADE|2=RESTART IDENTITY), relids
frame("truncate", b"T" + be32(2) + u8(1) + be32(16384) + be32(16385))
# single relation, no options
frame("truncate_single", b"T" + be32(1) + u8(0) + be32(16384))
# three relations, CASCADE + RESTART IDENTITY
frame("truncate_cascade_restart",
      b"T" + be32(3) + u8(3) + be32(16384) + be32(16385) + be32(16386))
# Relation re-announcing relid 16384 WIDENED by one column (the frame a
# mid-transaction ALTER TABLE produces) with REPLICA IDENTITY FULL
REL_WIDE = (b"R" + be32(16384) + cstr("public") + cstr("users") +
            u8(ord("f")) + be16(4) +
            u8(1) + cstr("id") + be32(23) + be32(-1) +
            u8(0) + cstr("name") + be32(25) + be32(-1) +
            u8(0) + cstr("bio") + be32(25) + be32(-1) +
            u8(0) + cstr("score") + be32(701) + be32(-1))
frame("relation_widened", REL_WIDE)
# insert in the POST-DDL 4-column shape
frame("insert_after_ddl",
      b"I" + be32(16384) + b"N" +
      tuple_data(text_cell("7"), text_cell("gail"), NULL_CELL,
                 text_cell("1.5")))
# Origin with an empty name (legal: the name is just a cstring)
frame("origin_empty", b"O" + be64(0x3333) + cstr(""))
# Logical message: Int8 transactional, Int64 lsn, String prefix,
#                  Int32 length, content
DDL = b'{"tableId":16384,"table":"users","cols":[]}'
frame("logical_msg",
      b"M" + u8(1) + be64(0x2222) + cstr("graft_ddl") +
      be32(len(DDL)) + DDL)
frame("logical_msg_foreign",
      b"M" + u8(0) + be64(0x2223) + cstr("other_ext") + be32(3) + b"abc")
# the REFERENCE's own DDL event-trigger message (prefix
# supabase_etl_ddl, pg_catalog-shaped payload with attnums — see its
# migrations/source/20260415100000_schema_change_messages.up.sql):
# accepted verbatim for drop-in sources
SUPA = (b'{"command_tag":"ALTER TABLE","nspname":"public",'
        b'"relname":"users","oid":16384,'
        b'"identity":{"primary_key_attnums":[1],"relreplident":"d",'
        b'"replica_identity_index_attnums":[]},'
        b'"columns":[{"attname":"id","attnum":1,"typname":"int8",'
        b'"atttypmod":-1,"attnotnull":true,"atthasdef":false,'
        b'"default_expression":null}]}')
frame("logical_msg_reference",
      b"M" + u8(1) + be64(0x2224) + cstr("supabase_etl_ddl") +
      be32(len(SUPA)) + SUPA)

# zero-column table (CREATE TABLE t() is legal; pgoutput sends ncols=0
# and inserts carry an empty TupleData) with REPLICA IDENTITY NOTHING
REL_ZERO = (b"R" + be32(16390) + cstr("public") + cstr("zero") +
            u8(ord("n")) + be16(0))
frame("relation_zero_cols", REL_ZERO)
frame("insert_zero_cols", b"I" + be32(16390) + b"N" + tuple_data())

# ---------------- protocol v2: streamed in-progress transactions (PG 14+)
# Stream Start: Int32 xid, Int8 first_segment
frame("stream_start", b"S" + be32(777) + u8(1))
frame("stream_start_next", b"S" + be32(777) + u8(0))
# Stream Stop: no body
frame("stream_stop", b"E")
# Stream Commit: Int32 xid, Int8 flags, Int64 commit lsn, Int64 end lsn,
#                Int64 commit ts
frame("stream_commit",
      b"c" + be32(777) + u8(0) + be64(0x16B3748) + be64(0x16B3800) + be64(TS))
# Stream Abort: Int32 xid, Int32 subxid (== xid for whole-tx aborts)
frame("stream_abort", b"A" + be32(777) + be32(777))
frame("stream_abort_sub", b"A" + be32(777) + be32(778))
# v4 extension: Int64 abort LSN + Int64 abort timestamp
frame("stream_abort_v4",
      b"A" + be32(777) + be32(778) + be64(0x18FE0) + be64(TS))

# -------------- protocol v3: two-phase commit messages (PG 15+)
# Begin Prepare: Int64 prepare lsn, Int64 end lsn, Int64 prepare ts,
#                Int32 xid, String gid
frame("begin_prepare",
      b"b" + be64(0x16B4000) + be64(0x16B4010) + be64(TS) + be32(888) +
      cstr("gid-42"))
# Prepare: Int8 flags, Int64 prepare lsn, Int64 end lsn, Int64 ts,
#          Int32 xid, String gid
frame("prepare",
      b"P" + u8(0) + be64(0x16B4000) + be64(0x16B4010) + be64(TS) +
      be32(888) + cstr("gid-42"))
# Commit Prepared: Int8 flags, Int64 commit lsn, Int64 end lsn, Int64 ts,
#                  Int32 xid, String gid
frame("commit_prepared",
      b"K" + u8(0) + be64(0x16B5000) + be64(0x16B5010) + be64(TS) +
      be32(888) + cstr("gid-42"))
# Rollback Prepared: Int8 flags, Int64 prepare end lsn, Int64 rollback
#                    end lsn, Int64 prepare ts, Int64 rollback ts,
#                    Int32 xid, String gid
frame("rollback_prepared",
      b"r" + u8(0) + be64(0x16B4010) + be64(0x16B6000) + be64(TS) +
      be64(TS + 1000) + be32(888) + cstr("gid-42"))
# Stream Prepare: same shape as Prepare, type 'p'
frame("stream_prepare",
      b"p" + u8(0) + be64(0x16B4000) + be64(0x16B4010) + be64(TS) +
      be32(888) + cstr("gid-42"))

# ------------------------------------------------------- COPY-BOTH session
def backend(t, payload):
    """Backend message: type(1) + len(4, incl itself) + payload."""
    return t + be32(4 + len(payload)) + payload

def xlogdata(wal_start, wal_end, pg_frame):
    return backend(b"d", b"w" + be64(wal_start) + be64(wal_end) + be64(TS) +
                   pg_frame)

def keepalive(wal_end, reply):
    # Primary Keepalive rides inside CopyData like XLogData, sub-type 'k'
    return backend(b"d", b"k" + be64(wal_end) + be64(TS) +
                   u8(1 if reply else 0))

# step auth: AuthenticationOk (R, code 0) + ReadyForQuery (Z, idle)
auth = backend(b"R", be32(0)) + backend(b"Z", b"I")

# step show: response to SHOW wal_sender_timeout —
#   RowDescription (T): Int16 nfields; per field: name\0, Int32 tableoid,
#   Int16 attnum, Int32 typoid, Int16 typlen, Int32 typmod, Int16 fmt
rowdesc = backend(b"T", be16(1) + cstr("wal_sender_timeout") + be32(0) +
                  be16(0) + be32(25) + be16(-1) + be32(-1) + be16(0))
val = b"60s"
datarow = backend(b"D", be16(1) + be32(len(val)) + val)
show = rowdesc + datarow + backend(b"C", cstr("SHOW")) + backend(b"Z", b"I")

# step stream: CopyBothResponse (W: Int8 fmt, Int16 ncols) + two
# transactions + a reply-requested keepalive. LSNs chosen so tx2 > tx1.
T1, T2 = 0x1000, 0x2000
tx1 = (xlogdata(T1 - 48, T1, b"B" + be64(T1) + be64(TS) + be32(900)) +
       xlogdata(T1 - 40, T1, REL) +
       xlogdata(T1 - 32, T1, b"I" + be32(16384) + b"N" +
                tuple_data(text_cell("1"), text_cell("alice"), NULL_CELL)) +
       xlogdata(T1 - 24, T1, b"I" + be32(16384) + b"N" +
                tuple_data(text_cell("2"), text_cell("bob"),
                           text_cell("héllo"))) +
       xlogdata(T1 - 8, T1, b"C" + u8(0) + be64(T1) + be64(T1 + 8) + be64(TS)))
tx2 = (xlogdata(T2 - 40, T2, b"B" + be64(T2) + be64(TS) + be32(901)) +
       xlogdata(T2 - 32, T2, b"U" + be32(16384) +
                b"K" + tuple_data(text_cell("2"), NULL_CELL, NULL_CELL) +
                b"N" + tuple_data(text_cell("2"), text_cell("bob2"),
                                  TOAST_CELL)) +
       xlogdata(T2 - 24, T2, b"D" + be32(16384) + b"K" +
                tuple_data(text_cell("1"), NULL_CELL, NULL_CELL)) +
       xlogdata(T2 - 8, T2, b"C" + u8(0) + be64(T2) + be64(T2 + 8) + be64(TS)))
stream = (backend(b"W", u8(0) + be16(0)) + tx1 + tx2 +
          keepalive(T2 + 8, True))

# second recorded stream: the decoder's high-branching cases on the
# wire — Origin inside the Begin bracket, a MID-TRANSACTION Relation
# re-announcing the same relid widened by a column (the ALTER TABLE
# shape), a post-DDL 4-column insert, and a multi-TOAST update
T3 = 0x3000
tx3 = (xlogdata(T3 - 64, T3, b"B" + be64(T3) + be64(TS) + be32(902)) +
       xlogdata(T3 - 60, T3, b"O" + be64(0x2F00) + cstr("region_b")) +
       xlogdata(T3 - 56, T3, REL) +
       xlogdata(T3 - 48, T3, b"I" + be32(16384) + b"N" +
                tuple_data(text_cell("1"), text_cell("alice"), NULL_CELL)) +
       xlogdata(T3 - 40, T3, b"U" + be32(16384) + b"N" +
                tuple_data(text_cell("1"), TOAST_CELL, TOAST_CELL)) +
       xlogdata(T3 - 32, T3, REL_WIDE) +
       xlogdata(T3 - 24, T3, b"I" + be32(16384) + b"N" +
                tuple_data(text_cell("7"), text_cell("gail"), NULL_CELL,
                           text_cell("1.5"))) +
       xlogdata(T3 - 16, T3, b"T" + be32(1) + u8(0) + be32(16384)) +
       xlogdata(T3 - 8, T3, b"C" + u8(0) + be64(T3) + be64(T3 + 8) + be64(TS)))
stream2 = (backend(b"W", u8(0) + be16(0)) + tx3 +
           keepalive(T3 + 8, True))

session = [("auth", auth), ("show", show), ("stream", stream),
           ("stream2", stream2)]

# third recorded stream: protocol v2 streamed in-progress transactions —
# two INTERLEAVED streamed txs (905 with a subtransaction abort, 906
# whole-tx aborted), a normal tx between their blocks, stream commits.
# In-stream data frames carry a leading Int32 subxid after the type byte.
def streamed(subxid, pg_frame):
    return pg_frame[:1] + be32(subxid) + pg_frame[1:]
T4, T5 = 0x4000, 0x5000
INS = lambda i, n: (b"I" + be32(16384) + b"N" +
                    tuple_data(text_cell(i), text_cell(n), NULL_CELL))
v2 = (backend(b"W", u8(0) + be16(0)) +
      # base relation announced OUTSIDE any stream (as a fresh wal
      # sender session would) — the normal tx below needs it before the
      # streamed tx's own announcement replays at its commit
      xlogdata(T4 - 70, T4, REL) +
      # tx 905 block 1: relation + one parent insert + one subxact insert
      xlogdata(T4 - 64, T4, b"S" + be32(905) + u8(1)) +
      xlogdata(T4 - 60, T4, streamed(905, REL)) +
      xlogdata(T4 - 56, T4, streamed(905, INS("1", "keep1"))) +
      xlogdata(T4 - 52, T4, streamed(910, INS("2", "drop1"))) +
      xlogdata(T4 - 48, T4, b"E") +
      # tx 906 block 1 interleaves
      xlogdata(T4 - 44, T4, b"S" + be32(906) + u8(1)) +
      xlogdata(T4 - 40, T4, streamed(906, INS("9", "aborted"))) +
      xlogdata(T4 - 36, T4, b"E") +
      # rollback to savepoint: subxact 910 of 905 aborts
      xlogdata(T4 - 32, T4, b"A" + be32(905) + be32(910)) +
      # a NORMAL v1 transaction commits between blocks
      xlogdata(T4 - 28, T4, b"B" + be64(T4) + be64(TS) + be32(907)) +
      xlogdata(T4 - 24, T4, INS("5", "normal")) +
      xlogdata(T4 - 20, T4, b"C" + u8(0) + be64(T4) + be64(T4 + 8) +
               be64(TS)) +
      # tx 905 block 2: one more parent insert
      xlogdata(T4 - 16, T4, b"S" + be32(905) + u8(0)) +
      xlogdata(T4 - 12, T4, streamed(905, INS("3", "keep2"))) +
      xlogdata(T4 - 8, T4, b"E") +
      # tx 906 aborts whole; tx 905 stream-commits at T5
      xlogdata(T4 - 4, T4, b"A" + be32(906) + be32(906)) +
      xlogdata(T5 - 8, T5, b"c" + be32(905) + u8(0) + be64(T5) +
               be64(T5 + 8) + be64(TS)) +
      keepalive(T5 + 8, True))
session.append(("stream_v2", v2))

# fourth/fifth recorded streams: protocol v3 two-phase commit ACROSS A
# CRASH — session A delivers BeginPrepare..Prepare for gid g2pc plus an
# unrelated committed transaction (durable progress passes the prepare),
# then the test drops the connection; session B is the publisher's
# redelivery from the capped confirmed flush: the SAME prepared
# transaction again (idempotent spool reset), the SAME normal
# transaction again (at-least-once tail), then COMMIT PREPARED.
P1, T6, C1 = 0x6000, 0x6800, 0x7000
v3a = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(P1 - 80, P1, REL) +
       xlogdata(P1 - 64, P1, b"b" + be64(P1) + be64(P1 + 0x10) + be64(TS) +
                be32(920) + cstr("g2pc")) +
       xlogdata(P1 - 56, P1, INS("1", "p1")) +
       xlogdata(P1 - 48, P1, INS("2", "p2")) +
       xlogdata(P1 - 40, P1, b"P" + u8(0) + be64(P1) + be64(P1 + 0x10) +
                be64(TS) + be32(920) + cstr("g2pc")) +
       # unrelated tx COMMITS while g2pc is undecided: downstream durable
       # progress now exceeds the prepare LSN
       xlogdata(T6 - 24, T6, b"B" + be64(T6) + be64(TS) + be32(921)) +
       xlogdata(T6 - 16, T6, INS("5", "normal")) +
       xlogdata(T6 - 8, T6, b"C" + u8(0) + be64(T6) + be64(T6 + 8) +
                be64(TS)) +
       keepalive(T6 + 8, True))
v3b = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(P1 - 80, P1, REL) +
       # redelivered prepare (BeginPrepare resets the gid's spool)
       xlogdata(P1 - 64, P1, b"b" + be64(P1) + be64(P1 + 0x10) + be64(TS) +
                be32(920) + cstr("g2pc")) +
       xlogdata(P1 - 56, P1, INS("1", "p1")) +
       xlogdata(P1 - 48, P1, INS("2", "p2")) +
       xlogdata(P1 - 40, P1, b"P" + u8(0) + be64(P1) + be64(P1 + 0x10) +
                be64(TS) + be32(920) + cstr("g2pc")) +
       # redelivered normal tx (the at-least-once tail the replay
       # guards downstream absorb)
       xlogdata(T6 - 24, T6, b"B" + be64(T6) + be64(TS) + be32(921)) +
       xlogdata(T6 - 16, T6, INS("5", "normal")) +
       xlogdata(T6 - 8, T6, b"C" + u8(0) + be64(T6) + be64(T6 + 8) +
                be64(TS)) +
       # the decision
       xlogdata(C1 - 8, C1, b"K" + u8(0) + be64(C1) + be64(C1 + 0x10) +
                be64(TS) + be32(920) + cstr("g2pc")) +
       keepalive(C1 + 0x10, True))
session.append(("stream_v3a", v3a))
session.append(("stream_v3b", v3b))

# sixth recorded stream: an Origin frame INSIDE the first stream segment
# (pgoutput sends the transaction's origin message right after the first
# Stream Start; it is a protocol message — NO leading subxid). A
# dropForeignOrigins client must filter the foreign streamed tx at its
# StreamCommit while an interleaved native streamed tx applies.
T7, T8 = 0x8000, 0x8100
v2o = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(T7 - 70, T7, REL) +
       # foreign streamed tx: Origin arrives inside the first segment
       xlogdata(T7 - 64, T7, b"S" + be32(930) + u8(1)) +
       xlogdata(T7 - 60, T7, b"O" + be64(0x7F00) + cstr("region_x")) +
       xlogdata(T7 - 56, T7, streamed(930, INS("1", "foreign"))) +
       xlogdata(T7 - 52, T7, b"E") +
       # native streamed tx interleaves — no origin
       xlogdata(T7 - 48, T7, b"S" + be32(931) + u8(1)) +
       xlogdata(T7 - 44, T7, streamed(931, INS("2", "native"))) +
       xlogdata(T7 - 40, T7, b"E") +
       xlogdata(T7 - 8, T7, b"c" + be32(930) + u8(0) + be64(T7) +
                be64(T7 + 8) + be64(TS)) +
       xlogdata(T8 - 8, T8, b"c" + be32(931) + u8(0) + be64(T8) +
                be64(T8 + 8) + be64(TS)) +
       keepalive(T8 + 8, True))
session.append(("stream_v2_origin", v2o))

# seventh/eighth: v3 + STREAMING across a crash — a large transaction
# streams in blocks, ends in StreamPrepare (spool transitions to the
# prepared set), an unrelated commit passes the prepare, crash, then
# redelivery + COMMIT PREPARED (the streamed sibling of stream_v3a/b).
P2, T9, C2 = 0x9000, 0x9800, 0xA000
v3s_prep = (xlogdata(P2 - 70, P2, REL) +
            xlogdata(P2 - 64, P2, b"S" + be32(940) + u8(1)) +
            xlogdata(P2 - 60, P2, streamed(940, INS("1", "sp1"))) +
            xlogdata(P2 - 56, P2, b"E") +
            xlogdata(P2 - 40, P2, b"p" + u8(0) + be64(P2) +
                     be64(P2 + 0x10) + be64(TS) + be32(940) + cstr("gs")) +
            xlogdata(T9 - 24, T9, b"B" + be64(T9) + be64(TS) + be32(941)) +
            xlogdata(T9 - 16, T9, INS("5", "normal")) +
            xlogdata(T9 - 8, T9, b"C" + u8(0) + be64(T9) + be64(T9 + 8) +
                     be64(TS)))
v3sa = (backend(b"W", u8(0) + be16(0)) + v3s_prep + keepalive(T9 + 8, True))
v3sb = (backend(b"W", u8(0) + be16(0)) + v3s_prep +
        xlogdata(C2 - 8, C2, b"K" + u8(0) + be64(C2) + be64(C2 + 0x10) +
                 be64(TS) + be32(940) + cstr("gs")) +
        keepalive(C2 + 0x10, True))
session.append(("stream_v3s_a", v3sa))
session.append(("stream_v3s_b", v3sb))

# ninth: a CASCADE truncate INSIDE a stream block (the protocol docs
# list Truncate among the messages that carry a leading Int32 xid when
# sent between Stream Start and Stream Stop) — it must spool with the
# block and replay at StreamCommit, preserving the CASCADE option bit
# and its position between the block's inserts.
TA = 0xB000
v2t = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(TA - 70, TA, REL) +
       xlogdata(TA - 64, TA, b"S" + be32(950) + u8(1)) +
       xlogdata(TA - 60, TA, streamed(950, INS("1", "pre"))) +
       # Truncate: Int32 nrelids, Int8 options (1 = CASCADE), relids
       xlogdata(TA - 56, TA, streamed(950, b"T" + be32(2) + u8(1) +
                be32(16384) + be32(16385))) +
       xlogdata(TA - 52, TA, streamed(950, INS("2", "post"))) +
       xlogdata(TA - 48, TA, b"E") +
       xlogdata(TA - 8, TA, b"c" + be32(950) + u8(0) + be64(TA) +
                be64(TA + 8) + be64(TS)) +
       keepalive(TA + 8, True))
session.append(("stream_v2_truncate", v2t))

# tenth: a keepalive-ONLY idle session. Served with wal_sender_timeout
# = 1s (the show_1s step below), the client's own keepalive deadline is
# max(0.6 × 1s, 100ms) = 600ms — an idle stream must stay alive across
# several deadline windows on periodic server keepalives alone
# (reply-requested and not), appending nothing.
idle = (backend(b"W", u8(0) + be16(0)) +
        keepalive(0x100, True) +
        keepalive(0x110, False) +
        keepalive(0x120, True))
session.append(("stream_idle", idle))
val_1s = b"1s"
show_1s = (backend(b"T", be16(1) + cstr("wal_sender_timeout") + be32(0) +
                   be16(0) + be32(25) + be16(-1) + be32(-1) + be16(0)) +
           backend(b"D", be16(1) + be32(len(val_1s)) + val_1s) +
           backend(b"C", cstr("SHOW")) + backend(b"Z", b"I"))
session.append(("show_1s", show_1s))

# eleventh/twelfth: v3 ROLLBACK PREPARED across a crash — session A
# prepares gid 'gr' and an unrelated transaction commits PAST it
# (durable progress exceeds the prepare; the test drops the connection
# at the capped flush); session B is the redelivery: the same prepare,
# the same unrelated transaction, then ROLLBACK PREPARED — the spool
# must vanish without a trace, the durable floor file must clear, and
# the flush must advance past the rollback.
P3, TB, R1 = 0xC000, 0xC800, 0xD000
v3r_common = (xlogdata(P3 - 70, P3, REL) +
       xlogdata(P3 - 64, P3, b"b" + be64(P3) + be64(P3 + 0x10) + be64(TS) +
                be32(960) + cstr("gr")) +
       xlogdata(P3 - 56, P3, INS("1", "doomed")) +
       xlogdata(P3 - 40, P3, b"P" + u8(0) + be64(P3) + be64(P3 + 0x10) +
                be64(TS) + be32(960) + cstr("gr")) +
       xlogdata(TB - 24, TB, b"B" + be64(TB) + be64(TS) + be32(961)) +
       xlogdata(TB - 16, TB, INS("5", "normal")) +
       xlogdata(TB - 8, TB, b"C" + u8(0) + be64(TB) + be64(TB + 8) +
                be64(TS)))
v3ra = (backend(b"W", u8(0) + be16(0)) + v3r_common +
        keepalive(TB + 8, True))
# Rollback Prepared: Int8 flags, Int64 prepare end lsn, Int64 rollback
# end lsn, Int64 prepare ts, Int64 rollback ts, Int32 xid, String gid
v3rb = (backend(b"W", u8(0) + be16(0)) + v3r_common +
        xlogdata(R1 - 8, R1, b"r" + u8(0) + be64(P3 + 0x10) + be64(R1) +
                 be64(TS) + be64(TS + 1000) + be32(960) + cstr("gr")) +
        keepalive(R1 + 0x10, True))
session.append(("stream_v3r_a", v3ra))
session.append(("stream_v3r_b", v3rb))

# thirteenth: an EMPTY prepared transaction (PREPARE TRANSACTION on a
# transaction whose publication saw no rows — e.g. all changes hit
# unpublished tables) decided by COMMIT PREPARED, followed by a normal
# transaction. The client must hold the cap while undecided, release it
# at the (line-less) decision, and keep the log free of any trace.
PE, TC = 0xE000, 0xE800
v3e = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(PE - 70, PE, REL) +
       xlogdata(PE - 64, PE, b"b" + be64(PE) + be64(PE + 0x10) + be64(TS) +
                be32(970) + cstr("gempty")) +
       xlogdata(PE - 40, PE, b"P" + u8(0) + be64(PE) + be64(PE + 0x10) +
                be64(TS) + be32(970) + cstr("gempty")) +
       xlogdata(PE + 0x20, PE + 0x20,
                b"K" + u8(0) + be64(PE + 0x20) + be64(PE + 0x30) + be64(TS) +
                be32(970) + cstr("gempty")) +
       xlogdata(TC - 24, TC, b"B" + be64(TC) + be64(TS) + be32(971)) +
       xlogdata(TC - 16, TC, INS("9", "after")) +
       xlogdata(TC - 8, TC, b"C" + u8(0) + be64(TC) + be64(TC + 8) +
                be64(TS)) +
       keepalive(TC + 8, True))
session.append(("stream_v3_empty", v3e))

# fourteenth: a transactional logical message ('M', the engine's DDL
# prefix) INSIDE a stream block — the protocol docs list Message among
# the types that carry a leading Int32 xid when streamed. It must spool
# with the block and replay at StreamCommit IN POSITION between the
# block's inserts; an unknown-prefix streamed message is discarded at
# replay (the DDL channel processes only the engine prefix).
TD = 0xF000
DDL2 = b'{"tableId":16384,"table":"users","cols":[]}'
msg_ddl = (b"M" + u8(1) + be64(0xF100) + cstr("graft_ddl") +
           be32(len(DDL2)) + DDL2)
msg_other = (b"M" + u8(1) + be64(0xF200) + cstr("other_ext") +
             be32(2) + b"zz")
v2m = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(TD - 70, TD, REL) +
       xlogdata(TD - 64, TD, b"S" + be32(980) + u8(1)) +
       xlogdata(TD - 60, TD, streamed(980, INS("1", "pre"))) +
       xlogdata(TD - 56, TD, streamed(980, msg_ddl)) +
       xlogdata(TD - 52, TD, streamed(980, msg_other)) +
       xlogdata(TD - 48, TD, streamed(980, INS("2", "post"))) +
       xlogdata(TD - 44, TD, b"E") +
       xlogdata(TD - 8, TD, b"c" + be32(980) + u8(0) + be64(TD) +
                be64(TD + 8) + be64(TS)) +
       keepalive(TD + 8, True))
session.append(("stream_v2_msg", v2m))

# fifteenth: an EMPTY stream block (StreamStart immediately followed by
# StreamStop — every change of the spilled segment hit unpublished
# tables), then its StreamCommit: zero data lines, the flush advances
# past the commit, and the session stays healthy for a trailing normal
# transaction.
TE = 0xF800
v2e = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(TE - 70, TE, REL) +
       xlogdata(TE - 64, TE, b"S" + be32(985) + u8(1)) +
       xlogdata(TE - 60, TE, b"E") +
       xlogdata(TE - 8, TE, b"c" + be32(985) + u8(0) + be64(TE) +
                be64(TE + 8) + be64(TS)) +
       xlogdata(TE + 0x10, TE + 0x18, b"B" + be64(TE + 0x18) + be64(TS) +
                be32(986)) +
       xlogdata(TE + 0x14, TE + 0x18, INS("5", "after")) +
       xlogdata(TE + 0x18, TE + 0x18, b"C" + u8(0) + be64(TE + 0x18) +
                be64(TE + 0x20) + be64(TS)) +
       keepalive(TE + 0x20, True))
session.append(("stream_v2_empty", v2e))

# sixteenth: TWO interleaved prepared transactions decided OUT OF
# ORDER — gid 'ga' prepares at PA, gid 'gb' prepares at PB > PA, a
# normal transaction commits past both, then gb COMMITs FIRST (the
# flush cap must STAY below PA: ga is still undecided), and finally ga
# ROLLBACKs (the cap clears and the flush advances to the tail).
PA, PB, TF, CB, RA = 0x10000, 0x11000, 0x12000, 0x13000, 0x14000
v3two = (backend(b"W", u8(0) + be16(0)) +
         xlogdata(PA - 80, PA, REL) +
         xlogdata(PA - 64, PA, b"b" + be64(PA) + be64(PA + 0x10) +
                  be64(TS) + be32(990) + cstr("ga")) +
         xlogdata(PA - 56, PA, INS("1", "a1")) +
         xlogdata(PA - 40, PA, b"P" + u8(0) + be64(PA) + be64(PA + 0x10) +
                  be64(TS) + be32(990) + cstr("ga")) +
         xlogdata(PB - 64, PB, b"b" + be64(PB) + be64(PB + 0x10) +
                  be64(TS) + be32(991) + cstr("gb")) +
         xlogdata(PB - 56, PB, INS("2", "b1")) +
         xlogdata(PB - 40, PB, b"P" + u8(0) + be64(PB) + be64(PB + 0x10) +
                  be64(TS) + be32(991) + cstr("gb")) +
         xlogdata(TF - 24, TF, b"B" + be64(TF) + be64(TS) + be32(992)) +
         xlogdata(TF - 16, TF, INS("5", "normal")) +
         xlogdata(TF - 8, TF, b"C" + u8(0) + be64(TF) + be64(TF + 8) +
                  be64(TS)) +
         # LATER prepare decided FIRST: flush may not pass PA yet
         xlogdata(CB - 8, CB, b"K" + u8(0) + be64(CB) + be64(CB + 0x10) +
                  be64(TS) + be32(991) + cstr("gb")) +
         keepalive(CB + 0x10, True) +
         # the EARLIER prepare rolls back: cap releases entirely
         xlogdata(RA - 8, RA, b"r" + u8(0) + be64(PA + 0x10) + be64(RA) +
                  be64(TS) + be64(TS + 1000) + be32(990) + cstr("ga")) +
         keepalive(RA + 0x10, True))
session.append(("stream_v3_two_gids", v3two))

# seventeenth/eighteenth: SERVER-INITIATED CopyDone — a shutting-down
# wal sender (restart, standby promotion) ends the COPY-BOTH stream
# with CopyDone ('c') + CommandComplete + ReadyForQuery. The client
# must treat it as a GRACEFUL stream end (not an error), reconnect,
# and resume from its durable flush: session B delivers the next
# transaction only.
TG, TH = 0x15000, 0x15800
cd_a = (backend(b"W", u8(0) + be16(0)) +
        xlogdata(TG - 70, TG, REL) +
        xlogdata(TG - 24, TG, b"B" + be64(TG) + be64(TS) + be32(995)) +
        xlogdata(TG - 16, TG, INS("1", "one")) +
        xlogdata(TG - 8, TG, b"C" + u8(0) + be64(TG) + be64(TG + 8) +
                 be64(TS)) +
        keepalive(TG + 8, True) +
        # graceful sender shutdown: CopyDone, CommandComplete, ready
        backend(b"c", b"") +
        backend(b"C", cstr("COPY 0")) +
        backend(b"Z", b"I"))
cd_b = (backend(b"W", u8(0) + be16(0)) +
        xlogdata(TG - 70, TH, REL) +
        xlogdata(TH - 24, TH, b"B" + be64(TH) + be64(TS) + be32(996)) +
        xlogdata(TH - 16, TH, INS("2", "two")) +
        xlogdata(TH - 8, TH, b"C" + u8(0) + be64(TH) + be64(TH + 8) +
                 be64(TS)) +
        keepalive(TH + 8, True))
session.append(("stream_copydone_a", cd_a))
session.append(("stream_copydone_b", cd_b))

# binary tuple mode (`binary 'true'`, PG 14+): cells arrive in each
# type's binary SEND format (utils/adt/*.c) instead of its text output.
# One transaction over a type-diverse relation: an insert with every
# cell binary, then an update mixing a binary key image, binary new
# values and a TOAST placeholder.
REL_BIN = (b"R" + be32(16392) + cstr("public") + cstr("bintypes") +
           u8(ord("d")) + be16(10) +
           u8(1) + cstr("id") + be32(23) + be32(-1) +      # int4
           u8(0) + cstr("flag") + be32(16) + be32(-1) +    # bool
           u8(0) + cstr("cnt") + be32(20) + be32(-1) +     # int8
           u8(0) + cstr("ratio") + be32(701) + be32(-1) +  # float8
           u8(0) + cstr("label") + be32(25) + be32(-1) +   # text
           u8(0) + cstr("doc") + be32(3802) + be32(-1) +   # jsonb
           u8(0) + cstr("born") + be32(1082) + be32(-1) +  # date
           u8(0) + cstr("at") + be32(1184) + be32(-1) +    # timestamptz
           u8(0) + cstr("uid") + be32(2950) + be32(-1) +   # uuid
           u8(0) + cstr("price") + be32(1700) + be32(-1))  # numeric
BIN_ROW = tuple_data(
    bin_cell(be32(7)),                                   # 7
    bin_cell(u8(1)),                                     # t
    bin_cell(be64(3000000000)),                          # 3000000000
    bin_cell(struct.pack(">d", -2.25)),                  # -2.25
    bin_cell("héllo".encode("utf-8")),                   # raw UTF-8 text
    bin_cell(b"\x01" + b'{"a":1}'),                      # jsonb v1 header
    bin_cell(be32(8324)),                                # 2022-10-16
    bin_cell(be64(0)),                                   # 2000-01-01 00:00:00+00
    bin_cell(bytes.fromhex("a0eebc999c0b4ef8bb6d6bb9bd380a11")),
    bin_cell(be16(2) + be16(0) + be16(0) + be16(4) +     # 1234.5678
             be16(1234) + be16(5678)))
BIN_KEY = tuple_data(bin_cell(be32(7)), *([NULL_CELL] * 9))
BIN_NEW = tuple_data(
    bin_cell(be32(7)), bin_cell(u8(0)),                  # flag flips to f
    TOAST_CELL, TOAST_CELL,                              # cnt/ratio unchanged
    bin_cell("rené".encode("utf-8")),
    NULL_CELL, TOAST_CELL, TOAST_CELL, TOAST_CELL,
    bin_cell(be16(1) + be16(-1) + be16(0x4000) + be16(3) +
             be16(10)))                                  # -0.001
T6 = 0x16000
binary_tx = (backend(b"W", u8(0) + be16(0)) +
             xlogdata(T6 - 40, T6, b"B" + be64(T6) + be64(TS) + be32(998)) +
             xlogdata(T6 - 32, T6, REL_BIN) +
             xlogdata(T6 - 24, T6, b"I" + be32(16392) + b"N" + BIN_ROW) +
             xlogdata(T6 - 16, T6, b"U" + be32(16392) +
                      b"K" + BIN_KEY + b"N" + BIN_NEW) +
             xlogdata(T6 - 8, T6, b"C" + u8(0) + be64(T6) + be64(T6 + 8) +
                      be64(TS)) +
             keepalive(T6 + 8, True))
session.append(("stream_binary", binary_tx))

# binary cells INSIDE a v2 stream block: the spool must hold the raw
# binary frames and convert at StreamCommit replay — binary mode and
# streamed transactions compose on the wire
T7, T8 = 0x17000, 0x17800
v2bin = (backend(b"W", u8(0) + be16(0)) +
         xlogdata(T7 - 40, T7, b"S" + be32(940) + u8(1)) +
         xlogdata(T7 - 36, T7, streamed(940, REL_BIN)) +
         xlogdata(T7 - 32, T7, streamed(940, b"I" + be32(16392) + b"N" +
                                        BIN_ROW)) +
         xlogdata(T7 - 28, T7, b"E") +
         xlogdata(T8 - 8, T8, b"c" + be32(940) + u8(0) + be64(T8) +
                  be64(T8 + 8) + be64(TS)) +
         keepalive(T8 + 8, True))
session.append(("stream_v2_binary", v2bin))

# v4 (PG 16, `streaming 'parallel'`) streamed transaction: the aborted
# subtransaction's Stream Abort carries the EXTENDED frame (Int64 abort
# LSN + Int64 abort timestamp — "available since protocol version 4").
# Replay semantics must be v2-identical: the aborted subtransaction's
# changes drop, the rest replays whole at StreamCommit.
T9, TA = 0x18000, 0x18800
v4tx = (backend(b"W", u8(0) + be16(0)) +
        xlogdata(T9 - 60, T9, b"S" + be32(950) + u8(1)) +
        xlogdata(T9 - 56, T9, streamed(950, REL)) +
        xlogdata(T9 - 52, T9, streamed(950, b"I" + be32(16384) + b"N" +
                 tuple_data(text_cell("1"), text_cell("keep1"),
                            NULL_CELL))) +
        xlogdata(T9 - 48, T9, b"E") +
        xlogdata(T9 - 44, T9, b"S" + be32(950) + u8(0)) +
        xlogdata(T9 - 40, T9, streamed(951, b"I" + be32(16384) + b"N" +
                 tuple_data(text_cell("2"), text_cell("drop1"),
                            NULL_CELL))) +
        xlogdata(T9 - 36, T9, b"E") +
        xlogdata(T9 - 32, T9, b"A" + be32(950) + be32(951) +
                 be64(T9 - 32) + be64(TS)) +
        xlogdata(T9 - 28, T9, b"S" + be32(950) + u8(0)) +
        xlogdata(T9 - 24, T9, streamed(950, b"I" + be32(16384) + b"N" +
                 tuple_data(text_cell("3"), text_cell("keep2"),
                            NULL_CELL))) +
        xlogdata(T9 - 20, T9, b"E") +
        xlogdata(TA - 8, TA, b"c" + be32(950) + u8(0) + be64(TA) +
                 be64(TA + 8) + be64(TS)) +
        keepalive(TA + 8, True))
session.append(("stream_v4", v4tx))

# RENAME-shaped Relation mid-stream: the same relid re-announced with
# the SAME column count and ONE changed name (what ALTER TABLE RENAME
# COLUMN produces on the wire) — the client must emit a second R record
# whose position-2 column carries the new name, so the downstream
# ordinal-keyed SchemaDiff records a RENAME (not an add+drop that
# would fork the destination column). A post-DDL update then decodes
# against the renamed shape.
REL_RENAMED = (b"R" + be32(16384) + cstr("public") + cstr("users") +
               u8(ord("d")) + be16(3) +
               u8(1) + cstr("id") + be32(23) + be32(-1) +
               u8(0) + cstr("full_name") + be32(25) + be32(-1) +
               u8(0) + cstr("bio") + be32(25) + be32(-1))
TB1, TB2 = 0x19000, 0x19800
rename_tx = (backend(b"W", u8(0) + be16(0)) +
             xlogdata(TB1 - 40, TB1, b"B" + be64(TB1) + be64(TS) +
                      be32(960)) +
             xlogdata(TB1 - 32, TB1, REL) +
             xlogdata(TB1 - 24, TB1, INS("1", "alice")) +
             xlogdata(TB1 - 8, TB1, b"C" + u8(0) + be64(TB1) +
                      be64(TB1 + 8) + be64(TS)) +
             xlogdata(TB2 - 40, TB2, b"B" + be64(TB2) + be64(TS) +
                      be32(961)) +
             xlogdata(TB2 - 32, TB2, REL_RENAMED) +
             xlogdata(TB2 - 24, TB2, b"U" + be32(16384) + b"N" +
                      tuple_data(text_cell("1"), text_cell("ada"),
                                 NULL_CELL)) +
             xlogdata(TB2 - 8, TB2, b"C" + u8(0) + be64(TB2) +
                      be64(TB2 + 8) + be64(TS)) +
             keepalive(TB2 + 8, True))
session.append(("stream_rename", rename_tx))

# v4 `streaming 'parallel'` × two-phase: a parallel-streamed tx whose
# subtransaction aborts via the EXTENDED v4 Stream Abort (Int64 abort
# LSN + Int64 abort ts), the parent ends in StreamPrepare, an unrelated
# transaction commits PAST the undecided prepare, and COMMIT PREPARED
# decides it — the interplay round 14 left unpinned.
PB, TC, CB = 0x1A000, 0x1A800, 0x1B000
v4p = (backend(b"W", u8(0) + be16(0)) +
       xlogdata(PB - 70, PB, REL) +
       xlogdata(PB - 64, PB, b"S" + be32(970) + u8(1)) +
       xlogdata(PB - 60, PB, streamed(970, INS("1", "keepA"))) +
       xlogdata(PB - 56, PB, streamed(971, INS("2", "dropA"))) +
       xlogdata(PB - 52, PB, b"E") +
       # v4 extended Stream Abort of subxact 971
       xlogdata(PB - 48, PB, b"A" + be32(970) + be32(971) +
                be64(PB - 48) + be64(TS)) +
       xlogdata(PB - 44, PB, b"S" + be32(970) + u8(0)) +
       xlogdata(PB - 40, PB, streamed(970, INS("3", "keepB"))) +
       xlogdata(PB - 36, PB, b"E") +
       xlogdata(PB - 32, PB, b"p" + u8(0) + be64(PB) + be64(PB + 0x10) +
                be64(TS) + be32(970) + cstr("gp4")) +
       xlogdata(TC - 24, TC, b"B" + be64(TC) + be64(TS) + be32(972)) +
       xlogdata(TC - 16, TC, INS("5", "normal")) +
       xlogdata(TC - 8, TC, b"C" + u8(0) + be64(TC) + be64(TC + 8) +
                be64(TS)) +
       xlogdata(CB - 8, CB, b"K" + u8(0) + be64(CB) + be64(CB + 0x10) +
                be64(TS) + be32(970) + cstr("gp4")) +
       keepalive(CB + 0x10, True))
session.append(("stream_v4_2pc", v4p))

# the ROLLBACK leg of the same interplay: identical parallel-streamed
# prepared transaction (extended-abort subxact and all), but decided by
# ROLLBACK PREPARED — every spooled line must vanish without a trace,
# the durable floor clears, and the flush advances past the rollback.
CR = 0x1B800
v4pr = (backend(b"W", u8(0) + be16(0)) +
        xlogdata(PB - 70, PB, REL) +
        xlogdata(PB - 64, PB, b"S" + be32(970) + u8(1)) +
        xlogdata(PB - 60, PB, streamed(970, INS("1", "keepA"))) +
        xlogdata(PB - 56, PB, streamed(971, INS("2", "dropA"))) +
        xlogdata(PB - 52, PB, b"E") +
        xlogdata(PB - 48, PB, b"A" + be32(970) + be32(971) +
                 be64(PB - 48) + be64(TS)) +
        xlogdata(PB - 44, PB, b"S" + be32(970) + u8(0)) +
        xlogdata(PB - 40, PB, streamed(970, INS("3", "keepB"))) +
        xlogdata(PB - 36, PB, b"E") +
        xlogdata(PB - 32, PB, b"p" + u8(0) + be64(PB) + be64(PB + 0x10) +
                 be64(TS) + be32(970) + cstr("gp4")) +
        xlogdata(TC - 24, TC, b"B" + be64(TC) + be64(TS) + be32(972)) +
        xlogdata(TC - 16, TC, INS("5", "normal")) +
        xlogdata(TC - 8, TC, b"C" + u8(0) + be64(TC) + be64(TC + 8) +
                 be64(TS)) +
        # Rollback Prepared: flags, prepare end lsn, rollback end lsn,
        # prepare ts, rollback ts, xid, gid
        xlogdata(CR - 8, CR, b"r" + u8(0) + be64(PB + 0x10) + be64(CR) +
                 be64(TS) + be64(TS + 1000) + be32(970) + cstr("gp4")) +
        keepalive(CR + 0x10, True))
session.append(("stream_v4_2pc_rollback", v4pr))

# async ParameterStatus + NoticeResponse arriving MID-stream INSIDE
# COPY BOTH (between CopyData frames — a live server interleaves them
# there too, e.g. a reloaded GUC broadcast): the receive loop must skip
# them without tearing the framing or the transaction bracket. Round 14
# pinned the pre-CopyBothResponse window only.
TD = 0x1C000
ps_mid = (backend(b"W", u8(0) + be16(0)) +
          xlogdata(TD - 40, TD, b"B" + be64(TD) + be64(TS) + be32(980)) +
          xlogdata(TD - 32, TD, REL) +
          backend(b"S", cstr("application_name") + cstr("walsender")) +
          xlogdata(TD - 24, TD, INS("1", "alice")) +
          backend(b"N", b"S" + cstr("NOTICE") + b"V" + cstr("NOTICE") +
                  b"C" + cstr("00000") +
                  b"M" + cstr("parameter change broadcast") + b"\x00") +
          xlogdata(TD - 8, TD, b"C" + u8(0) + be64(TD) + be64(TD + 8) +
                   be64(TS)) +
          keepalive(TD + 8, True))
session.append(("stream_param_status", ps_mid))

# the reference's supabase_etl_ddl message ON THE WIRE: a pre-DDL
# transaction, then the ALTER TABLE transaction carrying the
# pg_catalog-shaped logical message (rename name->full_name, attnums
# 1/2/3), then the renamed Relation re-announcement with post-DDL
# traffic. The client must forward the payload verbatim as a schema
# record in transaction position.
SUPA_REN = (b'{"command_tag":"ALTER TABLE","nspname":"public",'
            b'"relname":"users","oid":16384,'
            b'"identity":{"primary_key_attnums":[1],"relreplident":"d",'
            b'"replica_identity_index_attnums":[]},'
            b'"columns":['
            b'{"attname":"id","attnum":1,"typname":"int8",'
            b'"atttypmod":-1,"attnotnull":true,"atthasdef":false,'
            b'"default_expression":null},'
            b'{"attname":"full_name","attnum":2,"typname":"text",'
            b'"atttypmod":-1,"attnotnull":false,"atthasdef":false,'
            b'"default_expression":null},'
            b'{"attname":"bio","attnum":3,"typname":"text",'
            b'"atttypmod":-1,"attnotnull":false,"atthasdef":false,'
            b'"default_expression":null}]}')
TE1, TE2, TE3 = 0x1D000, 0x1D800, 0x1E000
ref_ddl = (backend(b"W", u8(0) + be16(0)) +
           xlogdata(TE1 - 40, TE1, b"B" + be64(TE1) + be64(TS) +
                    be32(990)) +
           xlogdata(TE1 - 32, TE1, REL) +
           xlogdata(TE1 - 24, TE1, INS("1", "alice")) +
           xlogdata(TE1 - 8, TE1, b"C" + u8(0) + be64(TE1) +
                    be64(TE1 + 8) + be64(TS)) +
           xlogdata(TE2 - 40, TE2, b"B" + be64(TE2) + be64(TS) +
                    be32(991)) +
           xlogdata(TE2 - 32, TE2, b"M" + u8(1) + be64(TE2 - 32) +
                    cstr("supabase_etl_ddl") + be32(len(SUPA_REN)) +
                    SUPA_REN) +
           xlogdata(TE2 - 8, TE2, b"C" + u8(0) + be64(TE2) +
                    be64(TE2 + 8) + be64(TS)) +
           xlogdata(TE3 - 40, TE3, b"B" + be64(TE3) + be64(TS) +
                    be32(992)) +
           xlogdata(TE3 - 32, TE3, REL_RENAMED) +
           xlogdata(TE3 - 24, TE3, b"U" + be32(16384) + b"N" +
                    tuple_data(text_cell("1"), text_cell("ada"),
                               NULL_CELL)) +
           xlogdata(TE3 - 8, TE3, b"C" + u8(0) + be64(TE3) +
                    be64(TE3 + 8) + be64(TS)) +
           keepalive(TE3 + 8, True))
session.append(("stream_ref_ddl", ref_ddl))

# attnum-keyed DDL message followed by a POSITIONAL wire Relation that
# ALSO adds a column (a concurrent ALTER ADD between the trigger firing
# and pgoutput's Relation re-announcement): the stored version carries
# attnums {1,2,4} — attnum 3 was dropped before the pipeline ever saw
# the table — so the Relation's positions must rebuild BY NAME against
# the stored attnums (gap preserved) and the new column must mint a
# fresh ordinal ABOVE the stored max, on the wire, not just in the
# model spec.
SUPA_GAP = (b'{"command_tag":"ALTER TABLE","nspname":"public",'
            b'"relname":"users","oid":16384,'
            b'"identity":{"primary_key_attnums":[1],"relreplident":"d",'
            b'"replica_identity_index_attnums":[]},'
            b'"columns":['
            b'{"attname":"id","attnum":1,"typname":"int8",'
            b'"atttypmod":-1,"attnotnull":true,"atthasdef":false,'
            b'"default_expression":null},'
            b'{"attname":"full_name","attnum":2,"typname":"text",'
            b'"atttypmod":-1,"attnotnull":false,"atthasdef":false,'
            b'"default_expression":null},'
            b'{"attname":"bio","attnum":4,"typname":"text",'
            b'"atttypmod":-1,"attnotnull":false,"atthasdef":false,'
            b'"default_expression":null}]}')
# the wire Relation after the concurrent ADD: positions 1..4, no attnums
REL_GAP_ADD = (b"R" + be32(16384) + cstr("public") + cstr("users") +
               u8(ord("d")) + be16(4) +
               u8(1) + cstr("id") + be32(20) + be32(-1) +
               u8(0) + cstr("full_name") + be32(25) + be32(-1) +
               u8(0) + cstr("bio") + be32(25) + be32(-1) +
               u8(0) + cstr("score") + be32(701) + be32(-1))
TG1, TG2 = 0x1F000, 0x1F800
attnum_align = (backend(b"W", u8(0) + be16(0)) +
                xlogdata(TG1 - 40, TG1, b"B" + be64(TG1) + be64(TS) +
                         be32(995)) +
                xlogdata(TG1 - 32, TG1, b"M" + u8(1) + be64(TG1 - 32) +
                         cstr("supabase_etl_ddl") + be32(len(SUPA_GAP)) +
                         SUPA_GAP) +
                xlogdata(TG1 - 8, TG1, b"C" + u8(0) + be64(TG1) +
                         be64(TG1 + 8) + be64(TS)) +
                xlogdata(TG2 - 40, TG2, b"B" + be64(TG2) + be64(TS) +
                         be32(996)) +
                xlogdata(TG2 - 32, TG2, REL_GAP_ADD) +
                xlogdata(TG2 - 24, TG2, b"I" + be32(16384) + b"N" +
                         tuple_data(text_cell("9"), text_cell("gwen"),
                                    NULL_CELL, text_cell("2.5"))) +
                xlogdata(TG2 - 8, TG2, b"C" + u8(0) + be64(TG2) +
                         be64(TG2 + 8) + be64(TS)) +
                keepalive(TG2 + 8, True))
session.append(("stream_attnum_align", attnum_align))

# supabase_etl_ddl whose REPLICA IDENTITY is an index DISTINCT from the
# primary key (relreplident 'i', replica_identity_index_attnums [2] vs
# primary_key_attnums [1]): the identity mask must come from the index
# attnums, NOT fall back to the PK — key-change expansion then keys off
# full_name, not id.
SUPA_IDENT = (b'{"command_tag":"ALTER TABLE","nspname":"public",'
              b'"relname":"users","oid":16384,'
              b'"identity":{"primary_key_attnums":[1],"relreplident":"i",'
              b'"replica_identity_index_attnums":[2]},'
              b'"columns":['
              b'{"attname":"id","attnum":1,"typname":"int8",'
              b'"atttypmod":-1,"attnotnull":true,"atthasdef":false,'
              b'"default_expression":null},'
              b'{"attname":"full_name","attnum":2,"typname":"text",'
              b'"atttypmod":-1,"attnotnull":true,"atthasdef":false,'
              b'"default_expression":null},'
              b'{"attname":"bio","attnum":3,"typname":"text",'
              b'"atttypmod":-1,"attnotnull":false,"atthasdef":false,'
              b'"default_expression":null}]}')
TH1 = 0x20000
ref_ddl_ident = (backend(b"W", u8(0) + be16(0)) +
                 xlogdata(TH1 - 40, TH1, b"B" + be64(TH1) + be64(TS) +
                          be32(997)) +
                 xlogdata(TH1 - 32, TH1, b"M" + u8(1) + be64(TH1 - 32) +
                          cstr("supabase_etl_ddl") +
                          be32(len(SUPA_IDENT)) + SUPA_IDENT) +
                 xlogdata(TH1 - 8, TH1, b"C" + u8(0) + be64(TH1) +
                          be64(TH1 + 8) + be64(TS)) +
                 keepalive(TH1 + 8, True))
session.append(("stream_ref_ddl_ident", ref_ddl_ident))

# ErrorResponse ('E'): list of (code byte, cstr value) fields, then a
# terminating zero byte — per the docs' "Message Formats".
def err_resp(sqlstate, msg):
    return backend(b"E", b"S" + cstr("ERROR") + b"V" + cstr("ERROR") +
                   b"C" + cstr(sqlstate) + b"M" + cstr(msg) + b"\x00")

# mid-binary-COPY ErrorResponse: CopyOutResponse (fmt=1), one CopyData
# carrying the PGCOPY header + a complete row + HALF of a second row
# (its third cell declares 5 bytes but only 2 arrive), then the backend
# aborts the COPY. The reassembler is mid-`fill` waiting for the rest
# of the cell — it must surface the error LOUDLY, not wait forever for
# bytes that will never come. Schema: id int8, name text.
def bin_field_err(raw):
    return be32(len(raw)) + raw
copy_err_bytes = (b"PGCOPY\n\xff\r\n\x00" + be32(0) + be32(0) +
                  be16(2) + bin_field_err(be64(1)) + bin_field_err(b"ann") +
                  be16(2) + bin_field_err(be64(2)) + be32(5) + b"bo")
copy_binary_error = (
    backend(b"H", u8(1) + be16(0)) +
    backend(b"d", copy_err_bytes) +
    err_resp("57P01",
             "terminating connection due to administrator command") +
    backend(b"Z", b"I"))
session.append(("copy_binary_error", copy_binary_error))

# slot-in-use at START_REPLICATION: SQLSTATE 55006 (object_in_use) — a
# rival wal receiver still holds the slot (normal during failover
# handover). The client must surface a NAMED retryable condition and
# try again with backoff; the retry is answered with the `stream` step.
slot_busy = (err_resp("55006",
                      'replication slot "conf_slot" is active for PID 4711') +
             backend(b"Z", b"I"))
session.append(("slot_busy", slot_busy))

# async NoticeResponse + ParameterStatus arriving BETWEEN the
# START_REPLICATION query and the CopyBothResponse — a live server
# interleaves these anywhere (slot-creation NOTICE, reloaded GUC); the
# client must skip them, not die on "expected CopyBothResponse".
notices = (backend(b"N", b"S" + cstr("NOTICE") + b"V" + cstr("NOTICE") +
                   b"C" + cstr("00000") +
                   b"M" + cstr("created logical replication slot") +
                   b"\x00") +
           backend(b"S", cstr("wal_sender_timeout") + cstr("45s")))
session.append(("notices", notices))

# NoticeResponse arriving DURING the startup/auth exchange (before
# ReadyForQuery), plus BackendKeyData — informational frames the
# handshake must skip; byte-pinned so the tolerance cannot regress.
auth_notice = (backend(b"N", b"S" + cstr("NOTICE") + b"V" + cstr("NOTICE") +
                       b"C" + cstr("00000") +
                       b"M" + cstr("connection logged") + b"\x00") +
               backend(b"R", be32(0)) +
               backend(b"S", cstr("server_encoding") + cstr("UTF8")) +
               backend(b"K", be32(4242) + be32(0x5EC2E7)) +
               backend(b"Z", b"I"))
session.append(("auth_notice", auth_notice))

# ------------------------------------------------- binary COPY payload
# PGCOPY framing straight from the COPY docs ("Binary Format"): 11-byte
# signature, Int32 flags, Int32 header-extension length (+ bytes), per
# row Int16 field count + per field Int32 length (-1 NULL) + data in the
# type's binary send format, Int16 -1 trailer. Schema: id int8,
# name text, score float8, born date.
def bin_field(raw):
    return be32(len(raw)) + raw
NULL_FIELD = be32(-1)
copy_binary = (
    b"PGCOPY\n\xff\r\n\x00" + be32(0) + be32(4) + b"ext!" +  # header + ext
    be16(4) + bin_field(be64(1)) + bin_field("ann".encode()) +
    bin_field(struct.pack(">d", -2.25)) + bin_field(be32(8324)) +
    be16(4) + bin_field(be64(2)) + NULL_FIELD +
    bin_field(struct.pack(">d", 40.5)) + NULL_FIELD +
    be16(4) + bin_field(be64(3)) + bin_field("héllo".encode("utf-8")) +
    NULL_FIELD + bin_field(be32(0)) +
    be16(-1))
dump_rows_copy = [("copy_binary", copy_binary)]

# ------------------------------------------------------------------ write
def dump(path, rows):
    with open(path, "w") as f:
        f.write("# generated by tools/gen_pg_fixtures.py — bytes assembled\n"
                "# independently from the PostgreSQL protocol docs; do not\n"
                "# derive from the Scala codec.\n")
        for name, payload in rows:
            f.write("%s\t%s\n" % (name, payload.hex()))

dump(os.path.join(OUT, "pgoutput_frames.txt"), frames)
dump(os.path.join(OUT, "copyboth_session.txt"), session)
dump(os.path.join(OUT, "copy_binary.txt"), dump_rows_copy)
print("wrote %d frame fixtures, %d session steps, %d copy payloads" %
      (len(frames), len(session), len(dump_rows_copy)))
