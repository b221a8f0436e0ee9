from raycrawl.functions.urlnorm import (
    canonicalize_batch,
    rfc3986_normalize,
    shard_of,
    url_hash,
    url_host,
)


def test_lowercase_scheme_host():
    assert (
        rfc3986_normalize("HTTP://Host3.EXAMPLE.com/p/5")
        == "http://host3.example.com/p/5"
    )


def test_default_port_stripped():
    assert rfc3986_normalize("http://a.com:80/x") == "http://a.com/x"
    assert rfc3986_normalize("https://a.com:443/x") == "https://a.com/x"
    assert rfc3986_normalize("http://a.com:8080/x") == "http://a.com:8080/x"


def test_dot_segments():
    assert rfc3986_normalize("http://a.com/p/./5") == "http://a.com/p/5"
    assert rfc3986_normalize("http://a.com/p/../q/5") == "http://a.com/q/5"
    assert rfc3986_normalize("http://a.com/a/b/../../c") == "http://a.com/c"


def test_percent_encoding():
    # unreserved chars decoded, escapes uppercased
    assert rfc3986_normalize("http://a.com/%70/5") == "http://a.com/p/5"
    assert rfc3986_normalize("http://a.com/%2fx") == "http://a.com/%2Fx"


def test_empty_path_and_fragment():
    assert rfc3986_normalize("http://a.com") == "http://a.com/"
    assert rfc3986_normalize("http://a.com/x#frag") == "http://a.com/x"


def test_query_preserved():
    assert rfc3986_normalize("http://a.com/x?b=2&a=1") == "http://a.com/x?b=2&a=1"


def test_equivalent_variants_same_hash():
    variants = [
        "http://host3.example.com/p/5",
        "HTTP://HOST3.EXAMPLE.COM/p/5",
        "http://host3.example.com:80/p/5",
        "http://host3.example.com/p/./5",
        "http://host3.example.com/%70/5",
    ]
    hashes = {url_hash(rfc3986_normalize(v)) for v in variants}
    assert len(hashes) == 1


def test_batch_matches_scalar():
    urls = ["http://A.com/x", "http://b.com:80/y", "http://A.com/x"]
    norm, digests, hosts = canonicalize_batch(urls)
    assert norm[0] == rfc3986_normalize(urls[0]) == norm[2]
    assert digests[1] == url_hash(rfc3986_normalize(urls[1]))
    assert hosts == ["a.com", "b.com", "a.com"]


def test_shard_stability():
    d = url_hash("http://a.com/")
    assert shard_of(d, 8) == shard_of(d, 8)
    assert 0 <= shard_of(d, 8) < 8


def test_url_host():
    assert url_host("http://A.B.com:8080/x") == "a.b.com"


def test_fast_path_is_fixed_point_of_slow_path():
    """Any URL the fast-path regex accepts must be an exact fixed point
    of rfc3986_normalize with an identical host — otherwise dedup keys
    would diverge by code path."""
    from hypothesis import given, settings, strategies as st

    from raycrawl.functions.urlnorm import (
        _fast_canonical_host,
        rfc3986_normalize,
        url_host,
    )

    host_label = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,5}[a-z0-9])?", fullmatch=True)
    path_seg = st.from_regex(r"[A-Za-z0-9._~!$&'()*+,;=:@-]{0,8}", fullmatch=True)

    @settings(max_examples=300, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "https"]),
        labels=st.lists(host_label, min_size=1, max_size=3),
        segs=st.lists(path_seg, min_size=0, max_size=4),
        query=st.one_of(st.none(), st.from_regex(r"[A-Za-z0-9=&._-]{1,12}", fullmatch=True)),
    )
    def check(scheme, labels, segs, query):
        url = f"{scheme}://{'.'.join(labels)}/" + "/".join(segs)
        if query is not None:
            url += f"?{query}"
        host = _fast_canonical_host(url)
        if host is not None:
            assert rfc3986_normalize(url) == url, url
            assert url_host(url) == host, url

    check()


def test_fast_path_rejects_non_canonical():
    from raycrawl.functions.urlnorm import _fast_canonical_host

    for u in [
        "HTTP://a.example.com/x",        # uppercase scheme
        "http://A.example.com/x",        # uppercase host
        "http://a.example.com:80/x",     # default port
        "http://a.example.com./x",       # trailing dot host
        "http://u@a.example.com/x",      # userinfo
        "http://a.example.com/x/../y",   # dot segment
        "http://a.example.com/x/.",      # trailing dot segment
        "http://a.example.com/%7Ea",     # percent escape
        "http://a.example.com/x#f",      # fragment
        "http://a.example.com/x?",       # bare trailing ?
        "http://a.example.com",          # empty path
    ]:
        assert _fast_canonical_host(u) is None, u
