"""Frontier ordering parity tests (FIXTURES.md §7).

Semantics under test are those of /root/reference/src/crawler/
Url_classifier.cc: host reuse (:70-76), claim-empty-queue (:78-89),
park-in-top_q (:91-93), drain-contiguous-same-host + max-hostname-first
(:134-171), FIFO within host (:117-131).
"""
import pytest

from mycelium_ray.frontier import UrlClassifier, FrontierEmpty


def test_host_reuse_existing_queue():
    c = UrlClassifier(2)
    c.push("a.com", "u1")
    c.push("b.com", "u2")
    c.push("a.com", "u3")  # host a.com already owns queue 0
    assert c.q_len(0) == 2 and c.q_len(1) == 1 and c.q_len_top() == 0
    assert c.peek(0) == ("a.com", "u1")
    c.pop(0)
    assert c.peek(0) == ("a.com", "u3")  # FIFO within host


def test_claim_empty_queue_in_seq_order():
    c = UrlClassifier(3)
    c.push("x.com", "u1")   # queue 0
    c.push("y.com", "u2")   # queue 1
    c.push("z.com", "u3")   # queue 2
    c.pop(1) if False else None
    # drain queue 1, then a new host claims it (first empty in seq order)
    _ = c.peek(1)
    c.pop(1)
    c.push("w.com", "u4")
    assert c.peek(1) == ("w.com", "u4")


def test_park_in_top_q_and_max_host_first():
    c = UrlClassifier(1)
    c.push("a.com", "u1")        # claims queue 0
    c.push("m.com", "m1")        # parked
    c.push("z.com", "z1")        # parked
    c.push("b.com", "b1")        # parked
    c.push("z.com", "z2")        # parked
    assert c.q_len_top() == 4
    c.pop(0)
    # queue 0 empty → adopts MAX hostname from backlog: z.com, draining both
    host, payload = c.peek(0)
    assert (host, payload) == ("z.com", "z1")
    assert c.q_len(0) == 2 and c.q_len_top() == 2
    c.pop(0)
    assert c.peek(0) == ("z.com", "z2")  # contiguous same-host drained FIFO
    c.pop(0)
    assert c.peek(0) == ("m.com", "m1")  # next max host
    c.pop(0)
    assert c.peek(0) == ("b.com", "b1")
    c.pop(0)
    with pytest.raises(FrontierEmpty):
        c.peek(0)


def test_push_to_bound_empty_queue_keeps_binding():
    c = UrlClassifier(2)
    c.push("a.com", "u1")
    c.pop(0)
    # queue 0 is empty but still bound to a.com; same host returns to it
    c.push("a.com", "u2")
    assert c.peek(0) == ("a.com", "u2")


def test_rebind_empty_queue_to_new_host():
    c = UrlClassifier(1)
    c.push("a.com", "u1")
    c.pop(0)
    c.push("b.com", "u2")  # claims queue 0, rebinding from a.com
    assert c.peek(0) == ("b.com", "u2")
    # a.com no longer owns a queue → parks in top
    c.push("a.com", "u3")
    assert c.q_len_top() == 1


def test_size_and_empty():
    c = UrlClassifier(2)
    assert c.empty() and c.empty_top()
    c.push("a.com", 1)
    c.push("b.com", 2)
    c.push("c.com", 3)
    assert c.size() == 3
    assert not c.empty()
    assert c.q_len_top() == 1


def test_checkpoint_roundtrip():
    c = UrlClassifier(2)
    for host, u in [("a.com", "a1"), ("b.com", "b1"), ("z.com", "z1"),
                    ("a.com", "a2"), ("y.com", "y1"), ("z.com", "z2")]:
        c.push(host, u)
    rows = c.to_records()
    c2 = UrlClassifier.from_records(2, rows)
    # identical drain order on both
    order1, order2 = [], []
    for cc, order in ((c, order1), (c2, order2)):
        while not cc.empty():
            for n in range(2):
                try:
                    order.append(cc.peek(n))
                    cc.pop(n)
                except FrontierEmpty:
                    pass
    assert order1 == order2
    assert len(order1) == 6


def test_prefix_host_max_first():
    """C++ std::string order: 'a.com.mx' > 'a.com' (prefix extension is
    GREATER), so the backlog serves 'a.com.mx' before 'a.com'. Golden
    against the reference semantics (Compare_hostname under
    std::priority_queue, Url_classifier.cc:112-115), not the shared class.
    """
    c = UrlClassifier(1)
    c.push("q.test", "seed")     # claims queue 0
    c.push("a.com", "short")     # parked
    c.push("a.com.mx", "long")   # parked
    c.pop(0)
    assert c.peek(0) == ("a.com.mx", "long")
    c.pop(0)
    assert c.peek(0) == ("a.com", "short")


def test_prefix_host_checkpoint_roundtrip_order():
    from mycelium_ray.frontier import UrlClassifier as UC
    c = UC(1)
    c.push("q.test", "seed")
    for h, p in [("b.x", "1"), ("b.x.y", "2"), ("b", "3")]:
        c.push(h, p)
    c2 = UC.from_records(1, c.to_records())
    for cl in (c, c2):
        cl.pop(0)
        order = []
        while True:
            try:
                host, _ = cl.peek(0)
            except FrontierEmpty:
                break
            order.append(host)
            cl.pop(0)
        assert order == ["b.x.y", "b.x", "b"]
