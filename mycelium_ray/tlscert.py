"""Self-signed TLS material for the loopback HTTPS fixture.

The sandbox has no outbound network, so the reference's TLS leg
(crawler.cc via libcurl's CURLOPT_CAINFO path) is exercised the same way
the HTTP leg is: a real handshake against the local fixture server. The
cert carries SAN IP 127.0.0.1 + DNS localhost + the site hostnames
(wildcard ``*.test`` by default) so stdlib ``ssl`` performs FULL
verification — chain AND hostname, checked against the URL's virtual
host via SNI like curl — no verify_mode=CERT_NONE shortcuts anywhere.

Gated behind an import-try: ``cryptography`` generates the keypair; if a
deployment lacks it, ``make_self_signed_cert`` raises with a clear
message and the TLS tests skip (the HTTP leg is unaffected).
"""

from __future__ import annotations

import datetime
import os
import ssl
import tempfile


def make_self_signed_cert(days: int = 7,
                          hosts: tuple[str, ...] = ()
                          ) -> tuple[bytes, bytes]:
    """(cert_pem, key_pem) for a loopback server — EC P-256, SAN
    127.0.0.1 / ::1 / localhost plus ``hosts`` DNS entries.

    The client transport verifies the certificate against the URL's
    virtual host (SNI), not the connect address, so pass the site's
    hostnames (``hosts=tuple(site.hosts)``). Explicit SANs, not a
    ``*.test`` wildcard: OpenSSL's X509_check_host refuses wildcards
    with fewer than two labels after the ``*`` (RFC 6125 §6.4.3
    public-suffix caution), so a TLD-wide wildcard never matches."""
    try:
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import ec
        from cryptography.x509.oid import NameOID
    except ImportError as e:  # pragma: no cover - present in this container
        raise RuntimeError(
            "TLS fixture needs the 'cryptography' package to mint a "
            "self-signed cert") from e
    import ipaddress

    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(hours=1))
        .not_valid_after(now + datetime.timedelta(days=days))
        .add_extension(x509.SubjectAlternativeName([
            x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
            x509.IPAddress(ipaddress.ip_address("::1")),
            x509.DNSName("localhost"),
        ] + [x509.DNSName(h) for h in hosts]), critical=False)
        .add_extension(x509.BasicConstraints(ca=True, path_length=None),
                       critical=True)
        .sign(key, hashes.SHA256())
    )
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption())
    return cert_pem, key_pem


def tls_san_hosts(site, seeds=()) -> tuple[str, ...]:
    """Every DNS name a client may handshake for against the fixture:
    site.hosts + all response/robots/seed URL hosts. The fixture serves
    ALL names on one listener and simulates resolution at the HTTP layer
    (X-fixture-resolve-fail), so even unknown-host URLs complete a
    handshake first — their names must be on the cert for the curl-6
    path to be reachable (real curl resolves before TLS; the
    forward-proxy topology inverts that order)."""
    import re
    names = set(site.hosts) | set(site.robots)
    for u in list(site.responses) + list(seeds):
        parts = u.split("/", 3)
        if len(parts) > 2:
            names.add(parts[2])
    ok = re.compile(r"^[A-Za-z0-9]([A-Za-z0-9.-]*[A-Za-z0-9])?$")
    return tuple(sorted(
        h for h in ((n.rsplit(":", 1)[0] if n.count(":") == 1 else n)
                    for n in names if n)
        if not h.startswith("[") and ok.match(h)))


def make_server_context(cert_pem: bytes, key_pem: bytes) -> ssl.SSLContext:
    """Server-side context. stdlib ssl loads cert chains from FILES only,
    so the PEMs round-trip through a private tempdir."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    with tempfile.TemporaryDirectory(prefix="mycelium_tls_") as d:
        cp, kp = os.path.join(d, "cert.pem"), os.path.join(d, "key.pem")
        with open(cp, "wb") as f:
            f.write(cert_pem)
        with open(kp, "wb") as f:
            f.write(key_pem)
        os.chmod(kp, 0o600)
        ctx.load_cert_chain(cp, kp)
    return ctx


def make_client_context(cert_pem: bytes) -> ssl.SSLContext:
    """Client-side context that FULLY verifies the fixture cert (the
    CURLOPT_CAINFO analog: the self-signed cert is the trust root)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cadata=cert_pem.decode("ascii"))
    ctx.check_hostname = True
    ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx
