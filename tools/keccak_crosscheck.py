#!/usr/bin/env python3
"""Independent Keccak-256 implementation (public FIPS-202/Keccak spec,
original 0x01 multi-rate padding) used to cross-check the Scala
implementation on multi-block inputs that have no published test vector.
Usage: keccak_crosscheck.py  → prints `<len> <hexdigest>` lines for the
lengths the Scala spec pins.
"""
import sys

RC = [0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
      0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
      0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
      0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
      0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
      0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
      0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
      0x8000000000008080, 0x0000000080000001, 0x8000000080008008]

ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
       [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]

M = (1 << 64) - 1

def rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & M

def keccak_f(a):
    for rnd in range(24):
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = rotl(a[x][y], ROT[x][y])
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & M)
        a[0][0] ^= RC[rnd]
    return a

def keccak256(msg: bytes) -> str:
    rate = 136
    padded = bytearray(msg)
    padded.append(0x01)
    while len(padded) % rate != 0:
        padded.append(0x00)
    padded[-1] |= 0x80
    a = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8:(i + 1) * 8], "little")
            a[i % 5][i // 5] ^= lane
        keccak_f(a)
    out = b"".join(
        a[i % 5][i // 5].to_bytes(8, "little") for i in range(4))
    return out.hex()

if __name__ == "__main__":
    assert keccak256(b"hello") == \
        "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8"
    assert keccak256(b"") == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    for n in (135, 136, 137, 200, 272, 1000):
        data = bytes(i % 251 for i in range(n))
        print(n, keccak256(data))
