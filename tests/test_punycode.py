"""Punycode / IDNA (mycelium_ray/punycode.py): RFC 3492 §7.1 sample
vectors, stdlib-idna interop both directions, host-level ACE handling,
honest errors. The idn_hosts pipeline key is covered by the oracle
parametrization in test_queries.py."""

import pytest

from mycelium_ray.punycode import (PunycodeError, idna_decode_host,
                                   idna_encode_host, punycode_decode,
                                   punycode_encode)

# RFC 3492 §7.1 sample strings (subset spanning scripts + mixed case)
RFC_SAMPLES = [
    ("".join(chr(c) for c in
     [0x644, 0x64A, 0x647, 0x645, 0x627, 0x628, 0x62A, 0x643, 0x644,
      0x645, 0x648, 0x634, 0x639, 0x631, 0x628, 0x64A, 0x61F]),
     "egbpdaj6bu4bxfgehfvwxn"),                       # (A) Arabic
    ("".join(chr(c) for c in
     [0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D, 0x8BF4, 0x4E2D,
      0x6587]),
     "ihqwcrb4cv8a8dqg056pqjye"),                     # (B) Chinese
    ("Pročprostěnemluvíčesky",
     "Proprostnemluvesky-uyb24dma41a"),               # (L) Czech
    ("bücher", "bcher-kva"),
]


@pytest.mark.parametrize("uni,puny", RFC_SAMPLES)
def test_rfc3492_vectors(uni, puny):
    assert punycode_encode(uni) == puny
    assert punycode_decode(puny) == uni


def test_ascii_only_label():
    assert punycode_encode("abc") == "abc-"
    assert punycode_decode("abc-") == "abc"


@pytest.mark.parametrize("label", ["bücher", "münchen", "ドメイン", "россия"])
def test_stdlib_interop(label):
    ours = "xn--" + punycode_encode(label)
    assert ours == label.encode("idna").decode()    # we encode like stdlib
    assert punycode_decode(ours[4:]) == label       # we decode our own
    assert ours.encode().decode("idna") == label    # stdlib decodes ours
    # and we decode stdlib's
    assert punycode_decode(label.encode("idna").decode()[4:]) == label


def test_host_level():
    assert idna_encode_host("Bücher.Example.COM") \
        == "xn--bcher-kva.example.com"
    assert idna_decode_host("xn--bcher-kva.example.com") \
        == "bücher.example.com"
    assert idna_encode_host("plain.example.com") == "plain.example.com"
    assert idna_encode_host("mixed.bücher.net") \
        == "mixed.xn--bcher-kva.net"


def test_errors():
    with pytest.raises(PunycodeError):
        punycode_decode("abc!")
    with pytest.raises(PunycodeError):
        punycode_decode("99999999999")      # overflow / out of range
    with pytest.raises(PunycodeError):
        idna_encode_host("xn--bücher.example")   # mixed ACE/unicode
