"""Barrier-mode distributed training tests (reference cluster-suite
parity, xgboost_cluster_test.py). local[8] gives the gang its slots."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.linalg import Vectors

from pyspark_xgboost_spark.ml.estimator import XgboostClassifier, XgboostRegressor


@pytest.fixture(scope="module")
def reg_df(spark):
    rows = [
        (Vectors.dense(float(i % 10), float((i * 3) % 7), float(i % 5)), float(i % 10) * 2.0)
        for i in range(1500)
    ]
    return spark.createDataFrame(rows, ["features", "label"])


def test_distributed_matches_local(spark, reg_df):
    """Histogram allreduce gives the 3-worker model the same splits as
    the 1-worker model; leaf values may differ by summation-order ulps
    (shard-wise partial sums), so compare at 1e-6 — still three orders
    tighter than the reference's atol=1e-3 golden bar
    (xgboost_cluster_test.py:114-116)."""
    params = dict(n_estimators=10, max_depth=4)
    local = XgboostRegressor(**params).fit(reg_df)
    dist = XgboostRegressor(**params, num_workers=3).fit(reg_df)
    p_local = np.array([r.prediction for r in local.transform(reg_df).collect()])
    p_dist = np.array([r.prediction for r in dist.transform(reg_df).collect()])
    np.testing.assert_allclose(p_local, p_dist, atol=1e-6)


def test_distributed_classifier(spark):
    rows = [
        (Vectors.dense(float(i % 10), float((i * 7) % 13)), int((i % 10) >= 5))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, ["features", "label"])
    model = XgboostClassifier(n_estimators=8, max_depth=3, num_workers=2).fit(df)
    acc = np.mean([r.prediction == r.label for r in model.transform(df).collect()])
    assert acc == 1.0


def test_get_conf_boolean_semantics(spark):
    """O26 parity (reference tests/utils/__init__.py:8-31): any
    capitalization of true/false parses; invalid values raise; unset
    falls back to the default."""
    from pyspark_xgboost_spark.utils import get_conf_boolean

    spark.conf.set("myConf", "myVal")
    with pytest.raises(ValueError, match="boolean conf"):
        get_conf_boolean(spark, "myConf", False)
    for raw, expected in [("False", False), ("TRUE", True), ("true", True), (True, True)]:
        spark.conf.set("myConf", raw)
        assert get_conf_boolean(spark, "myConf", not expected) is expected
    spark.conf.unset("myConf")
    assert get_conf_boolean(spark, "myConf", False) is False
    assert get_conf_boolean(spark, "myConf", True) is True


def test_force_repartition_session_conf(spark, reg_df, monkeypatch):
    """The spark_graft.ml.force_repartition session conf overrides the
    estimator param: fit_distributed must see force_repartition=True
    even though the estimator left the param at its False default."""
    import pyspark_xgboost_spark.ml.tracker as tracker
    from pyspark_xgboost_spark.utils import FORCE_REPARTITION_CONF

    captured = {}
    real = tracker.fit_distributed

    def spy(narrowed, params, flags, num_workers, **kw):
        captured["force_repartition"] = kw.get("force_repartition")
        return real(narrowed, params, flags, num_workers, **kw)

    monkeypatch.setattr(tracker, "fit_distributed", spy)
    spark.conf.set(FORCE_REPARTITION_CONF, "true")
    try:
        XgboostRegressor(n_estimators=2, max_depth=2, num_workers=2).fit(reg_df)
    finally:
        spark.conf.unset(FORCE_REPARTITION_CONF)
    assert captured["force_repartition"] is True


def test_distributed_rejects_base_margin(spark, reg_df):
    df = reg_df.withColumn("bm", reg_df.label * 0.1)
    with pytest.raises(ValueError, match="baseMarginCol"):
        XgboostRegressor(n_estimators=2, num_workers=2, baseMarginCol="bm").fit(df)


# ---------------------------------------------------------------------------
# comm rendezvous unit tests (no Spark: raw sockets + threads)
# ---------------------------------------------------------------------------


def test_candidate_ports_deterministic_and_disjoint():
    from pyspark_xgboost_spark.ml.comm import candidate_ports

    a = candidate_ports("cookie-a")
    assert a == candidate_ports("cookie-a")
    assert len(set(a)) == len(a)
    assert all(20000 <= p < 50000 for p in a)
    # different cookie -> (almost surely) different walk start
    assert a[0] != candidate_ports("cookie-b")[0]


def test_rendezvous_comm_roundtrip():
    import threading

    import numpy as np

    from pyspark_xgboost_spark.ml.comm import (
        SocketComm,
        _ReduceServer,
        candidate_ports,
        connect_rendezvous,
        cookie_magic,
    )

    cookie = "test-stage-7-attempt-0"
    ports = candidate_ports(cookie)
    magic = cookie_magic(cookie)
    server = _ReduceServer(n_clients=2, magic=magic, ports=ports)
    assert server.port in ports

    results = {}

    def client(rank: int):
        sock = connect_rendezvous("127.0.0.1", ports, magic, rank, deadline_s=10)
        comm = SocketComm(rank, 3, sock=sock)
        results[rank] = comm.allreduce_sum(np.full(4, rank, dtype=np.float64))
        comm.close()

    threads = [threading.Thread(target=client, args=(r,)) for r in (1, 2)]
    for t in threads:
        t.start()
    comm0 = SocketComm(0, 3, server=server)
    results[0] = comm0.allreduce_sum(np.full(4, 0, dtype=np.float64))
    comm0.close()
    for t in threads:
        t.join(timeout=10)
    # 0 + 1 + 2 summed identically on every rank
    for r in (0, 1, 2):
        assert results[r].tolist() == [3.0, 3.0, 3.0, 3.0]


def _run_star(n, contribs, gathers):
    import threading

    from pyspark_xgboost_spark.ml.comm import (
        SocketComm,
        _ReduceServer,
        candidate_ports,
        connect_rendezvous,
        cookie_magic,
    )

    cookie = "topology-star-test"
    ports, magic = candidate_ports(cookie), cookie_magic(cookie)
    server = _ReduceServer(n_clients=n - 1, magic=magic, ports=ports)
    out = {}

    def worker(rank):
        if rank == 0:
            comm = SocketComm(0, n, server=server)
        else:
            comm = SocketComm(
                rank, n, sock=connect_rendezvous("127.0.0.1", ports, magic, rank)
            )
        out[rank] = (
            comm.allreduce_sum(contribs[rank]).tolist(),
            comm.allgather_bytes(gathers[rank]),
        )
        comm.close()

    threads = [threading.Thread(target=worker, args=(r,)) for r in range(1, n)]
    for t in threads:
        t.start()
    worker(0)
    for t in threads:
        t.join(timeout=30)
    return out


def _run_tree(n, fanout, contribs, gathers):
    import threading

    from pyspark_xgboost_spark.ml.comm import build_tree_comm

    out = {}

    def worker(rank):
        comm = build_tree_comm(
            rank, n, ["127.0.0.1"] * n, "topology-tree-test", fanout, deadline_s=30
        )
        out[rank] = (
            comm.allreduce_sum(contribs[rank]).tolist(),
            comm.allgather_bytes(gathers[rank]),
        )
        comm.close()

    threads = [threading.Thread(target=worker, args=(r,)) for r in range(1, n)]
    for t in threads:
        t.start()
    worker(0)
    for t in threads:
        t.join(timeout=30)
    return out


@pytest.mark.parametrize("n,fanout", [(9, 3), (7, 3), (5, 2)])
def test_tree_and_star_reductions_identical(n, fanout):
    """The two-level tree must be invisible above the comm interface:
    every rank's allreduce_sum and allgather_bytes results equal the
    star's, including uneven trailing groups (n not divisible by
    fanout)."""
    import numpy as np

    contribs = {r: np.arange(6, dtype=np.float64) * (r + 1) for r in range(n)}
    gathers = {r: f"blob-{r}".encode() for r in range(n)}
    star = _run_star(n, contribs, gathers)
    tree = _run_tree(n, fanout, contribs, gathers)
    assert set(star) == set(tree) == set(range(n))
    expected_sum = sum(contribs.values()).tolist()
    expected_gather = [gathers[r] for r in range(n)]
    for r in range(n):
        assert star[r] == (expected_sum, expected_gather)
        assert tree[r] == (expected_sum, expected_gather)


def test_distributed_tree_topology_matches_local(spark, reg_df):
    """End-to-end barrier fit over the tree comm (conf-forced; auto only
    engages beyond 64 workers) must reproduce the single-worker model."""
    params = dict(n_estimators=6, max_depth=3)
    local = XgboostRegressor(**params).fit(reg_df)
    spark.conf.set("spark_graft.ml.comm_topology", "tree")
    try:
        dist = XgboostRegressor(**params, num_workers=4).fit(reg_df)
    finally:
        spark.conf.unset("spark_graft.ml.comm_topology")
    p_local = np.array([r.prediction for r in local.transform(reg_df).collect()])
    p_dist = np.array([r.prediction for r in dist.transform(reg_df).collect()])
    np.testing.assert_allclose(p_local, p_dist, atol=1e-6)


def test_reduce_server_binds_scoped_address_when_local():
    """A local bind host must yield a scoped endpoint — the wildcard is
    reserved for EADDRNOTAVAIL (host not a local interface), never used
    just because it is listed or because a port was busy."""
    from pyspark_xgboost_spark.ml.comm import _ReduceServer, candidate_ports, cookie_magic

    cookie = "test-bind-scope-attempt-0"
    ports = candidate_ports(cookie)
    server = _ReduceServer(
        n_clients=1, host="127.0.0.1", magic=cookie_magic(cookie), ports=ports
    )
    try:
        assert server._srv.getsockname()[0] == "127.0.0.1"
    finally:
        server._srv.close()


def test_rendezvous_rejects_wrong_magic_and_tolerates_probes():
    import socket
    import struct
    import threading

    import numpy as np

    from pyspark_xgboost_spark.ml.comm import (
        SocketComm,
        _ReduceServer,
        candidate_ports,
        connect_rendezvous,
        cookie_magic,
    )

    cookie = "test-stage-9-attempt-1"
    ports = candidate_ports(cookie)
    magic = cookie_magic(cookie)
    server = _ReduceServer(n_clients=1, magic=magic, ports=ports)

    # a zombie/foreign probe: connects, reads magic, rejects it, drops —
    # the server must ignore it and still accept the real client
    probe = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    probe.recv(16)
    probe.close()

    # wrong-cookie client walking the same ports must NOT connect
    try:
        connect_rendezvous(
            "127.0.0.1", [server.port], cookie_magic("other"), 1, deadline_s=0.5
        )
        raise AssertionError("wrong magic accepted")
    except TimeoutError:
        pass

    done = {}

    def client():
        sock = connect_rendezvous("127.0.0.1", ports, magic, 1, deadline_s=10)
        comm = SocketComm(1, 2, sock=sock)
        done["sum"] = comm.allreduce_sum(np.array([1.0]))
        comm.close()

    t = threading.Thread(target=client)
    t.start()
    comm0 = SocketComm(0, 2, server=server)
    assert comm0.allreduce_sum(np.array([2.0])).tolist() == [3.0]
    comm0.close()
    t.join(timeout=10)
    assert done["sum"].tolist() == [3.0]


def test_rendezvous_rejects_stranger_and_bad_ranks():
    """Mutual handshake (round-1 advice): a TCP peer that connects and
    sends bytes that aren't the keyed echo must NOT occupy a rank slot;
    neither may a peer with the right echo but an out-of-range rank
    (rank 0 is the server itself; valid clients are 1..n_clients)."""
    import socket
    import struct
    import threading

    import numpy as np

    from pyspark_xgboost_spark.ml.comm import (
        SocketComm,
        _ReduceServer,
        candidate_ports,
        connect_rendezvous,
        cookie_magic,
        echo_token,
    )

    cookie = "test-stage-11-attempt-0"
    ports = candidate_ports(cookie)
    magic = cookie_magic(cookie)
    server = _ReduceServer(n_clients=1, magic=magic, ports=ports)

    # stranger: reads magic, replies with garbage where the echo goes
    s = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    s.recv(16)
    s.sendall(b"\x00" * 20)
    s.close()

    # right echo, but claims rank 0 (the server's own rank) — rejected
    s = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    s.recv(16)
    s.sendall(echo_token(magic) + struct.pack(">I", 0))
    # and an out-of-range rank
    s2 = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    s2.recv(16)
    s2.sendall(echo_token(magic) + struct.pack(">I", 5))

    done = {}

    def client():
        sock = connect_rendezvous("127.0.0.1", ports, magic, 1, deadline_s=10)
        comm = SocketComm(1, 2, sock=sock)
        done["sum"] = comm.allreduce_sum(np.array([1.0]))
        comm.close()

    t = threading.Thread(target=client)
    t.start()
    comm0 = SocketComm(0, 2, server=server)
    assert comm0.allreduce_sum(np.array([2.0])).tolist() == [3.0]
    comm0.close()
    t.join(timeout=10)
    assert done["sum"].tolist() == [3.0]
    for bad in (s, s2):
        try:
            bad.close()
        except OSError:
            pass


def test_distributed_continuation_matches_local(spark, reg_df):
    """xgb_model continuation through the barrier path: distributed
    continued fit equals local continued fit (margins are shard-local,
    only histograms cross the wire)."""
    init = XgboostRegressor(n_estimators=4, max_depth=3).fit(reg_df).get_booster()
    local = XgboostRegressor(n_estimators=3, max_depth=3, xgb_model=init).fit(reg_df)
    dist = XgboostRegressor(
        n_estimators=3, max_depth=3, xgb_model=init, num_workers=2
    ).fit(reg_df)
    a = np.array([r.prediction for r in local.transform(reg_df).collect()])
    b = np.array([r.prediction for r in dist.transform(reg_df).collect()])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_repartition_elision_plan_check(spark):
    """O6 parity (reference xgboost_cluster_test.py:308-325): an
    explicit user repartition(n) is detected and elided; a DataFrame
    that merely HAPPENS to have n partitions (no Repartition tail) is
    repartitioned anyway."""
    from pyspark_xgboost_spark.ml.tracker import _plan_tail_is_repartition

    df = spark.range(1000).selectExpr("id", "cast(id % 7 as double) v")
    assert _plan_tail_is_repartition(df.repartition(4))
    assert not _plan_tail_is_repartition(df)
    # projections and filters AFTER repartition are pushed BELOW the
    # round-robin exchange by Catalyst (content-independent routing
    # makes that semantics-preserving), so Repartition is still the
    # optimized tail and elision stays valid — the check reads the
    # OPTIMIZED plan on purpose
    assert _plan_tail_is_repartition(df.repartition(4).select("v"))
    assert _plan_tail_is_repartition(df.repartition(4).filter("v > 1"))
    # an aggregate genuinely replaces the partitioning — must re-shuffle
    assert not _plan_tail_is_repartition(df.repartition(4).groupBy("v").count())
