"""mbox/MIME source tests (`sources/mime.py`): round-trip through the
writer, cross-validation against the stdlib ``email`` package, the
RFC 2047 / quoted-printable / mboxrd corner cases, and quarantine."""

import email
import email.policy

import pytest

from table_streaming_source_spark.sources.mime import (
    build_message,
    decode_header_value,
    mbox_messages,
    parse_message,
    qp_decode,
    qp_encode,
    write_mbox,
)


def test_roundtrip_and_stdlib_crossvalidation(tmp_path):
    msgs = [
        build_message(
            from_addr=f"doc{i}@example.com",
            subject=f"Doc {i} — παράδειγμα #{i}",
            text=f"body {i}\nFrom the archive\nwith ümlauts\n",
            html=f"<p>body {i}&amp;</p>",
        )
        for i in range(12)
    ]
    p = str(tmp_path / "t.mbox")
    write_mbox(p, msgs)
    back = mbox_messages(open(p, "rb").read())
    assert len(back) == 12
    for i, m in enumerate(back):
        ours = parse_message(m)
        std = email.message_from_bytes(m, policy=email.policy.default)
        assert ours["subject"] == std["Subject"]
        assert (
            ours["parts"][0][1]
            == std.get_body(preferencelist=("plain",)).get_content()
        )
        assert ours["parts"][1][0] == "text/html"
        assert "From the archive" in ours["parts"][0][1]


def test_mboxrd_from_escaping_is_reversible(tmp_path):
    body = "From here\n>From there\n>>From deeper\nplain\n"
    msg = build_message(
        from_addr="a@b", subject="s", text=body, html="<p>x</p>"
    )
    p = str(tmp_path / "t.mbox")
    write_mbox(p, [msg, msg])
    back = mbox_messages(open(p, "rb").read())
    assert len(back) == 2
    for m in back:
        assert parse_message(m)["parts"][0][1] == body


def test_rfc2047_b_and_q_forms_and_adjacent_join():
    assert decode_header_value("=?UTF-8?B?aGVsbG8=?=") == "hello"
    assert decode_header_value("=?utf-8?Q?a_b=C3=A9?=") == "a bé"
    # whitespace between adjacent encoded-words is dropped
    assert (
        decode_header_value("=?UTF-8?B?YWI=?=  =?UTF-8?B?Y2Q=?=")
        == "abcd"
    )
    # plain text around encoded words survives
    assert decode_header_value("x =?UTF-8?B?eQ==?= z") == "x y z"


def test_qp_soft_breaks_and_escapes():
    data = ("é" * 60 + "=x\ty ").encode("utf-8")
    enc = qp_encode(data)
    assert b"=\r\n" in enc  # soft break emitted
    assert qp_decode(enc) == data
    with pytest.raises(ValueError, match="quoted-printable"):
        qp_decode(b"=ZZ")


def test_nested_multipart():
    inner_boundary = "inner-b"
    outer_boundary = "outer-b"
    msg = (
        "From: x@y\r\nSubject: nested\r\n"
        f'Content-Type: multipart/mixed; boundary="{outer_boundary}"\r\n'
        "\r\n"
        f"--{outer_boundary}\r\n"
        f'Content-Type: multipart/alternative; boundary="{inner_boundary}"\r\n'
        "\r\n"
        f"--{inner_boundary}\r\n"
        "Content-Type: text/plain\r\n\r\ninner plain\r\n"
        f"--{inner_boundary}--\r\n"
        f"--{outer_boundary}\r\n"
        "Content-Type: text/plain\r\n\r\nouter plain\r\n"
        f"--{outer_boundary}--\r\n"
    ).encode()
    parts = parse_message(msg)["parts"]
    assert [t for _, t in parts] == ["inner plain", "outer plain"]


def test_quarantine_bad_charset_and_not_mbox():
    msg = (
        "From: x@y\r\nContent-Type: text/plain; charset=latin-1\r\n"
        "\r\nbody"
    ).encode()
    with pytest.raises(ValueError, match="charset"):
        parse_message(msg)
    with pytest.raises(ValueError, match="mbox"):
        mbox_messages(b"not a mailbox")


def test_spark_reader_end_to_end(spark, tmp_path):
    from table_streaming_source_spark.sources.mime import read_mbox

    for shard in range(2):
        write_mbox(
            str(tmp_path / f"p{shard}.mbox"),
            [
                build_message(
                    from_addr=f"u{shard}-{i}@x",
                    subject=f"s{i}",
                    text=f"t{i}",
                    html="<p/>",
                )
                for i in range(5)
            ],
        )
    df = read_mbox(spark, str(tmp_path))
    got = sorted((r.from_addr, r.subject, r.n_parts, r.text) for r in df.collect())
    assert len(got) == 10
    assert got[0] == ("u0-0@x", "s0", 2, "t0")
