"""Collective communication for barrier-mode training.

Re-expresses the reference's collective layer (`src/collective/comm.h:184`,
ring allreduce `src/collective/allreduce.cc:21-129`, rendezvous tracker
`src/collective/tracker.h:80`) for Spark's barrier execution mode:

- rendezvous: `BarrierTaskContext.allGather` replaces the Rabit tracker —
  each task binds a listening socket, allgathers ``(rank, ip, port)``, and
  the ring is formed by rank order (the reference's own Spark wrapper uses
  the same barrier-rendezvous pattern, `spark/core.py:1036-1093`);
- allreduce: bandwidth-optimal ring reduce-scatter + allgather over TCP,
  duplex (select-based simultaneous send/recv so large payloads cannot
  deadlock).  Each chunk is accumulated in a fixed order along the ring
  and the reduced bytes are copied verbatim to every rank, so all ranks
  observe bit-identical sums — the property the deterministic replicated
  tree-growth loop relies on.

Payloads here are per-level gradient histograms: ``nodes x features x
(bins+1) x 2`` float64 — ≤ a few MB regardless of row count, so one
allreduce costs milliseconds while the alternative (a Spark shuffle per
tree level) costs a full job round-trip.
"""

from __future__ import annotations

import json
import select
import socket
import struct
import time

import numpy as np

_HDR = struct.Struct("<q")


def _local_ip() -> str:
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.connect(("10.254.254.254", 1))  # no traffic sent; picks egress iface
            return s.getsockname()[0]
        finally:
            s.close()
    except OSError:
        return "127.0.0.1"


class Comm:
    """Interface; `Loopback` for a single task, `RingComm` otherwise."""

    rank: int = 0
    nranks: int = 1

    def allreduce(self, arr: np.ndarray, op: str = "sum") -> np.ndarray:
        """op in {sum, min, max} (reference `Op` enum, comm.h:184)."""
        raise NotImplementedError

    def allreduce_sum(self, arr: np.ndarray) -> np.ndarray:
        return self.allreduce(arr, "sum")

    def allreduce_scalar(self, *vals: float) -> tuple[float, ...]:
        out = self.allreduce_sum(np.asarray(vals, dtype=np.float64))
        return tuple(float(v) for v in out)

    def allreduce_minmax(self, mins: np.ndarray, maxs: np.ndarray):
        """Elementwise global (min, max) in ONE allreduce: min over the
        concatenation of ``[mins, -maxs]``."""
        both = np.concatenate([np.asarray(mins, dtype=np.float64).ravel(),
                               -np.asarray(maxs, dtype=np.float64).ravel()])
        red = self.allreduce(both, "min")
        k = len(red) // 2
        return red[:k], -red[k:]

    def close(self):
        pass


_OPS = {"sum": np.add, "min": np.minimum, "max": np.maximum}


class Loopback(Comm):
    def allreduce(self, arr: np.ndarray, op: str = "sum") -> np.ndarray:
        return np.asarray(arr, dtype=np.float64)


class RingComm(Comm):
    def __init__(self, rank: int, nranks: int, send_sock: socket.socket,
                 recv_sock: socket.socket, srv: socket.socket):
        self.rank = rank
        self.nranks = nranks
        self._snd = send_sock
        self._rcv = recv_sock
        self._srv = srv
        self._snd.setblocking(False)
        self._rcv.setblocking(False)

    # -- rendezvous ----------------------------------------------------
    @classmethod
    def create(cls, barrier_ctx) -> Comm:
        """Build the ring from a `BarrierTaskContext`."""
        rank = barrier_ctx.partitionId()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("0.0.0.0", 0))
        srv.listen(4)
        port = srv.getsockname()[1]
        msgs = barrier_ctx.allGather(
            json.dumps({"rank": rank, "ip": _local_ip(), "port": port}))
        peers = sorted((json.loads(m) for m in msgs), key=lambda d: d["rank"])
        p = len(peers)
        if p == 1:
            srv.close()
            return Loopback()
        nxt = peers[(rank + 1) % p]
        snd = None
        deadline = time.time() + 120
        while True:
            try:
                snd = socket.create_connection((nxt["ip"], nxt["port"]), timeout=10)
                break
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.05)
        snd.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        snd.sendall(_HDR.pack(rank))
        srv.settimeout(120)
        rcv, _ = srv.accept()
        rcv.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        prev_rank = _HDR.unpack(_recv_exact_blocking(rcv, _HDR.size))[0]
        expected = (rank - 1) % p
        if prev_rank != expected:
            raise IOError(f"ring mis-wired: accepted rank {prev_rank}, expected {expected}")
        return cls(rank, p, snd, rcv, srv)

    # -- duplex exchange ----------------------------------------------
    def _exchange(self, send_bytes: bytes, recv_buf: memoryview):
        """Simultaneously send to next and fill recv_buf from prev."""
        snd, rcv = self._snd, self._rcv
        sview = memoryview(send_bytes)
        si, ri, rn = 0, 0, len(recv_buf)
        deadline = time.time() + 300
        while si < len(sview) or ri < rn:
            if time.time() > deadline:
                raise TimeoutError("ring allreduce stalled")
            rl, wl, _ = select.select(
                [rcv] if ri < rn else [], [snd] if si < len(sview) else [], [], 30)
            if rl:
                n = rcv.recv_into(recv_buf[ri:], rn - ri)
                if n == 0:
                    raise IOError("ring peer closed connection")
                ri += n
            if wl:
                si += snd.send(sview[si:si + (1 << 20)])

    # -- ring allreduce (reference allreduce.cc:21-129) ----------------
    def allreduce(self, arr: np.ndarray, op: str = "sum") -> np.ndarray:
        reduce_fn = _OPS[op]
        a = np.ascontiguousarray(arr, dtype=np.float64)
        shape = a.shape
        buf = a.ravel().copy()
        p, r = self.nranks, self.rank
        # chunk offsets (np.array_split boundaries — identical on all ranks)
        n = len(buf)
        base, extra = divmod(n, p)
        off = []
        s = 0
        for i in range(p):
            e = s + base + (1 if i < extra else 0)
            off.append((s, e))
            s = e
        tmp = np.empty(base + 1, dtype=np.float64)
        # reduce-scatter
        for step in range(p - 1):
            ss, se = off[(r - step) % p]
            rs, re = off[(r - step - 1) % p]
            rv = tmp[: re - rs]
            self._exchange(buf[ss:se].tobytes(), memoryview(rv).cast("B"))
            buf[rs:re] = reduce_fn(buf[rs:re], rv)
        # allgather
        for step in range(p - 1):
            ss, se = off[(r + 1 - step) % p]
            rs, re = off[(r - step) % p]
            rv = tmp[: re - rs]
            self._exchange(buf[ss:se].tobytes(), memoryview(rv).cast("B"))
            buf[rs:re] = rv
        return buf.reshape(shape)

    def close(self):
        for s in (self._snd, self._rcv, self._srv):
            try:
                s.close()
            except OSError:
                pass


def _recv_exact_blocking(sock: socket.socket, n: int) -> bytes:
    sock.settimeout(120)
    chunks = []
    got = 0
    while got < n:
        b = sock.recv(n - got)
        if not b:
            raise IOError("peer closed during handshake")
        chunks.append(b)
        got += len(b)
    return b"".join(chunks)
