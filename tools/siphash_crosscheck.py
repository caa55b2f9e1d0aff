#!/usr/bin/env python3
"""Independent SipHash-c-d from the public spec (Aumasson & Bernstein,
github.com/veorq/SipHash), to cross-check the Scala implementation's
SipHash-1-3 variant — the parameterization Rust's `siphasher` crate uses
for the reference engine's footer bloom — beyond the published 2-4
vectors and Guava agreement already pinned in SipHashSpec.

Prints `<c>-<d> <len> <hash hex>` lines for the standard vector setup
(key 000102...0f, input bytes 00,01,02,...) plus the bloom item framing
(8-byte little-endian length prefix || data) used by Rust's Vec<u8>
Hash impl.
"""
M64 = 0xFFFFFFFFFFFFFFFF


def rotl(x, b):
    return ((x << b) | (x >> (64 - b))) & M64


def sipround(v):
    v0, v1, v2, v3 = v
    v0 = (v0 + v1) & M64
    v1 = rotl(v1, 13) ^ v0
    v0 = rotl(v0, 32)
    v2 = (v2 + v3) & M64
    v3 = rotl(v3, 16) ^ v2
    v0 = (v0 + v3) & M64
    v3 = rotl(v3, 21) ^ v0
    v2 = (v2 + v1) & M64
    v1 = rotl(v1, 17) ^ v2
    v2 = rotl(v2, 32)
    return [v0, v1, v2, v3]


def siphash(c, d, k0, k1, data):
    v = [k0 ^ 0x736F6D6570736575, k1 ^ 0x646F72616E646F6D,
         k0 ^ 0x6C7967656E657261, k1 ^ 0x7465646279746573]
    n = len(data)
    end = n - (n % 8)
    for i in range(0, end, 8):
        m = int.from_bytes(data[i:i + 8], "little")
        v[3] ^= m
        for _ in range(c):
            v = sipround(v)
        v[0] ^= m
    b = (n & 0xFF) << 56
    b |= int.from_bytes(data[end:], "little")
    v[3] ^= b
    for _ in range(c):
        v = sipround(v)
    v[0] ^= b
    v[2] ^= 0xFF
    for _ in range(d):
        v = sipround(v)
    return v[0] ^ v[1] ^ v[2] ^ v[3]


def framed(data):
    """Rust Vec<u8> Hash framing: 8-byte LE length prefix || bytes."""
    return len(data).to_bytes(8, "little") + data


if __name__ == "__main__":
    k0 = int.from_bytes(bytes(range(8)), "little")
    k1 = int.from_bytes(bytes(range(8, 16)), "little")
    for (c, d) in [(2, 4), (1, 3)]:
        for n in [0, 1, 7, 8, 15, 32, 63]:
            data = bytes(range(n))
            print(f"{c}-{d} {n} {siphash(c, d, k0, k1, data):016x}")
    # bloom item probes: the framed form the footer bloom hashes
    for item in [b"", b"hello", bytes(32)]:
        print(f"framed-1-3 {len(item)} {siphash(1, 3, k0, k1, framed(item)):016x}")
