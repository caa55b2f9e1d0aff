#!/usr/bin/env python3
"""Independent BLAKE3 (hash mode) from the public spec, to cross-check the
Scala implementation on deep-tree inputs (≥4 chunks) beyond the pinned
official vectors. Prints `<len> <hexdigest>` for selected lengths.
"""
IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]
PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]
CHUNK_START, CHUNK_END, PARENT, ROOT = 1, 2, 4, 8
M32 = 0xFFFFFFFF

def rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & M32

def g(s, a, b, c, d, mx, my):
    s[a] = (s[a] + s[b] + mx) & M32
    s[d] = rotr(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & M32
    s[b] = rotr(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b] + my) & M32
    s[d] = rotr(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & M32
    s[b] = rotr(s[b] ^ s[c], 7)

def compress(cv, block, counter, block_len, flags):
    s = cv[:8] + IV[:4] + [counter & M32, (counter >> 32) & M32, block_len, flags]
    m = block[:]
    for rnd in range(7):
        g(s, 0, 4, 8, 12, m[0], m[1]); g(s, 1, 5, 9, 13, m[2], m[3])
        g(s, 2, 6, 10, 14, m[4], m[5]); g(s, 3, 7, 11, 15, m[6], m[7])
        g(s, 0, 5, 10, 15, m[8], m[9]); g(s, 1, 6, 11, 12, m[10], m[11])
        g(s, 2, 7, 8, 13, m[12], m[13]); g(s, 3, 4, 9, 14, m[14], m[15])
        if rnd < 6:
            m = [m[PERM[i]] for i in range(16)]
    return [(s[i] ^ s[i + 8]) & M32 for i in range(8)] + \
           [(s[i + 8] ^ cv[i]) & M32 for i in range(8)]

def words(b):
    b = b + b"\x00" * (64 - len(b))
    return [int.from_bytes(b[i * 4:(i + 1) * 4], "little") for i in range(16)]

def chunk_output(data, chunk_idx):
    cv = IV[:]
    n_blocks = max(1, (len(data) + 63) // 64)
    for b in range(n_blocks):
        blk = data[b * 64:(b + 1) * 64]
        flags = (CHUNK_START if b == 0 else 0) | \
                (CHUNK_END if b == n_blocks - 1 else 0)
        if b == n_blocks - 1:
            return (cv, words(blk), chunk_idx, len(blk), flags)
        cv = compress(cv, words(blk), chunk_idx, len(blk), flags)[:8]

def subtree(data, first_chunk):
    if len(data) <= 1024:
        return chunk_output(data, first_chunk)
    n_chunks = (len(data) + 1023) // 1024
    left_chunks = 1 << ((n_chunks - 1).bit_length() - 1)
    l = compress(*subtree(data[:left_chunks * 1024], first_chunk))[:8]
    r = compress(*subtree(data[left_chunks * 1024:], first_chunk + left_chunks))[:8]
    return (IV[:], l + r, 0, 64, PARENT)

def blake3(data: bytes) -> str:
    cv, block, _, block_len, flags = subtree(data, 0)
    out = compress(cv, block, 0, block_len, flags | ROOT)[:8]
    return b"".join(w.to_bytes(4, "little") for w in out).hex()

if __name__ == "__main__":
    data = bytes(i % 251 for i in range(102400))
    # official vectors as self-check
    assert blake3(b"") == \
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    assert blake3(data[:1025]) == \
        "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444"
    assert blake3(data[:3072]) == \
        "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2"
    for n in (4096, 5120, 5121, 8192, 10000, 31744):
        print(n, blake3(data[:n]))
