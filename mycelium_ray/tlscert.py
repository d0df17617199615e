"""Self-signed TLS material for the loopback HTTPS fixture.

The sandbox has no outbound network, so the reference's TLS leg
(crawler.cc via libcurl's CURLOPT_CAINFO path) is exercised the same way
the HTTP leg is: a real handshake against the local fixture server. The
cert carries SAN IP 127.0.0.1 + DNS localhost so stdlib ``ssl`` performs
FULL verification (check_hostname on) — no verify_mode=CERT_NONE
shortcuts anywhere.

Gated behind an import-try: ``cryptography`` generates the keypair; if a
deployment lacks it, ``make_self_signed_cert`` raises with a clear
message and the TLS tests skip (the HTTP leg is unaffected).
"""

from __future__ import annotations

import datetime
import os
import ssl
import tempfile


def make_self_signed_cert(days: int = 7) -> tuple[bytes, bytes]:
    """(cert_pem, key_pem) for a loopback server — EC P-256, SAN
    127.0.0.1 / ::1 / localhost."""
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
        ]), critical=False)
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
