"""Bit-exact glibc ``srand``/``rand`` replica (TYPE_3 additive-feedback
generator, the documented glibc random_r algorithm) — the reference's
presentation renderers seed their color palettes with ``srand(100)``
(src/morphology.cpp:50,74), so exact palette parity needs the exact
generator. Validated against a compiled C harness in
tests/test_render.py.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF


class GlibcRand:
    """glibc random() with the default 34-int state (TYPE_3)."""

    def __init__(self, seed: int = 1):
        self.srand(seed)

    def srand(self, seed: int) -> None:
        seed = seed & _MASK32
        if seed == 0:
            seed = 1
        r = [0] * 344
        r[0] = seed
        for i in range(1, 31):
            # r[i] = (16807 * r[i-1]) % 2147483647 computed the glibc
            # way (Schrage, signed wraparound semantics)
            hi, lo = divmod(r[i - 1], 127773)
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r[i] = word
        # direct pointer simulation of glibc random_r (TYPE_3, DEG=31,
        # SEP=3): fptr starts at state[3], rptr at state[0]
        self._state = r[:31]
        self._f = 3
        self._p = 0
        for _ in range(310):  # glibc discards the first 10*31 outputs
            self._next()

    def _next(self) -> int:
        s = self._state
        s[self._f] = (s[self._f] + s[self._p]) & _MASK32
        v = s[self._f] >> 1
        self._f = (self._f + 1) % 31
        self._p = (self._p + 1) % 31
        return v

    def rand(self) -> int:
        return self._next()
