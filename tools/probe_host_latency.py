"""Probe host scheduler-wakeup latency via loopback ping-pong.

Motivation (optimization round 14): the rig's bench numbers degraded
uniformly 2-25x mid-round -- including untouched TPC-H paths -- while
raw CPU throughput (32-proc spin), disk reads, syscall cost, and the
clocksource all measured healthy. The discriminating signal was
loopback round-trip latency: 64-70 us/RTT vs the ~10 us a healthy rig
shows. High wakeup latency murders Spark local mode's fine-grained
producer-consumer hot paths (py4j driver round-trips, futex handoffs
between task threads and the DAG scheduler loop, Netty) while leaving
long-running compute threads untouched -- exactly the observed uniform
slowdown with a near-idle load average.

Usage: python tools/probe_host_latency.py
Prints one JSON line: {"tcp_rtt_us": ..., "pair_rtt_us": ..., "spin_ms": ...}
Rule of thumb on this rig: tcp_rtt_us <= 20 -> bench-grade;
>= 40 -> absolute numbers are garbage, use tools/bench_ab.py ratios.
"""

from __future__ import annotations

import json
import socket
import threading
import time

N = 20_000


def _pingpong(send_sock, recv_side_sock) -> float:
    def echo(c):
        while True:
            d = c.recv(64)
            if not d:
                break
            c.sendall(d)

    threading.Thread(target=echo, args=(recv_side_sock,), daemon=True).start()
    t = time.perf_counter()
    for _ in range(N):
        send_sock.sendall(b"x")
        send_sock.recv(64)
    return (time.perf_counter() - t) / N * 1e6


def main() -> None:
    a, b = socket.socketpair()
    pair_us = _pingpong(a, b)

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    conns = {}

    def accept():
        conns["c"], _ = srv.accept()

    th = threading.Thread(target=accept, daemon=True)
    th.start()
    cl = socket.create_connection(("127.0.0.1", port))
    cl.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    th.join()
    tcp_us = _pingpong(cl, conns["c"])

    t = time.perf_counter()
    x = 0
    for i in range(1_000_000):
        x += i * i
    spin_ms = (time.perf_counter() - t) * 1e3

    print(json.dumps({
        "tcp_rtt_us": round(tcp_us, 1),
        "pair_rtt_us": round(pair_us, 1),
        "spin_ms": round(spin_ms, 1),
    }))


if __name__ == "__main__":
    main()
