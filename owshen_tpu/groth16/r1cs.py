"""R1CS constraint-system builder with inline witness computation.

A minimal circuit DSL (the role circom plays for the original Owshen wallet,
absent from the reference snapshot — SURVEY.md §0): variables are indices
into the witness vector [1, publics..., privates...]; constraints are
(A·w)·(B·w) = (C·w) rows with sparse linear combinations.

The builder tracks concrete values alongside structure, so one synthesis pass
yields both the constraint matrices (for setup) and the witness (for prove);
gadgets are written value-agnostically so the structure is identical with or
without values (witness generation stays on host per SURVEY.md §7.4.5).
"""

from __future__ import annotations

from ..fields.field import P_FR

P = P_FR


class LC(dict):
    """Sparse linear combination {var_index: coeff}."""

    def __add__(self, other):
        out = LC(self)
        for k, v in other.items():
            out[k] = (out.get(k, 0) + v) % P
        return out

    def __sub__(self, other):
        out = LC(self)
        for k, v in other.items():
            out[k] = (out.get(k, 0) - v) % P
        return out

    def scale(self, c: int):
        c %= P
        return LC({k: v * c % P for k, v in self.items()})

    @staticmethod
    def const(c: int):
        return LC({0: c % P})

    @staticmethod
    def var(i: int):
        return LC({i: 1})

    def eval(self, values):
        return sum(values[k] * v for k, v in self.items()) % P


class Builder:
    def __init__(self):
        self.values: list[int | None] = [1]
        self.n_pub = 0
        self._pub_done = False
        self.constraints: list[tuple[LC, LC, LC]] = []

    # ---------- allocation ----------

    def pub(self, value=None) -> LC:
        assert not self._pub_done, "allocate all public inputs first"
        self.values.append(None if value is None else value % P)
        self.n_pub += 1
        return LC.var(len(self.values) - 1)

    def priv(self, value=None) -> LC:
        self._pub_done = True
        self.values.append(None if value is None else value % P)
        return LC.var(len(self.values) - 1)

    @property
    def num_vars(self):
        return len(self.values)

    def _val(self, lc: LC):
        if any(self.values[k] is None for k in lc):
            return None
        return lc.eval(self.values)

    # ---------- constraints ----------

    def enforce(self, a: LC, b: LC, c: LC):
        self.constraints.append((a, b, c))

    def enforce_eq(self, a: LC, b: LC):
        self.enforce(a - b, LC.const(1), LC.const(0))

    def mul(self, a: LC, b: LC) -> LC:
        va, vb = self._val(a), self._val(b)
        out = self.priv(None if va is None or vb is None else va * vb % P)
        self.enforce(a, b, out)
        return out

    def square(self, a: LC) -> LC:
        return self.mul(a, a)

    def assert_bool(self, a: LC):
        self.enforce(a, a - LC.const(1), LC.const(0))

    def bits(self, a: LC, n: int) -> list[LC]:
        """Decompose into n little-endian bits (allocated + constrained)."""
        va = self._val(a)
        bs = []
        for i in range(n):
            bit_val = None if va is None else (va >> i) & 1
            b = self.priv(bit_val)
            self.assert_bool(b)
            bs.append(b)
        acc = LC()
        for i, b in enumerate(bs):
            acc = acc + b.scale(pow(2, i, P))
        self.enforce_eq(acc, a)
        return bs

    def mux(self, bit: LC, a: LC, b: LC) -> tuple[LC, LC]:
        """Returns (bit ? b : a, bit ? a : b) with one multiplication."""
        t = self.mul(bit, b - a)
        return a + t, b - t

    # ---------- export ----------

    def compiled(self, n_rows: int):
        """Constraint matrices as nnz-BUCKETED index/coefficient arrays for
        the device sparse matvec.

        Padding every row to K = max nnz is quadratic waste when a few rows
        are wide (Poseidon partial-round LCs reach 61 nonzeros at depth 16
        while the mean is ~9): rows are grouped by next-power-of-two nnz, so
        memory and gather traffic stay proportional to total nnz.  For each
        of A, B, C returns a list of buckets
        (row_ids int32[r], idx int32[r, k], coeff uint32[r, k, L] Montgomery)
        padded with var 0 / coeff 0 within each bucket; rows absent from all
        buckets evaluate to 0.  n_rows >= len(constraints)."""
        from ..fields.field import FR
        import numpy as np

        out = []
        for which in range(3):
            buckets: dict[int, list] = {}
            for j, c in enumerate(self.constraints):
                r = list(c[which].items())
                if not r:
                    continue
                k = 1 << max(0, (len(r) - 1).bit_length())
                buckets.setdefault(k, []).append((j, r))
            mats = []
            for k, items in sorted(buckets.items()):
                rids = np.asarray([j for j, _ in items], np.int32)
                idx = np.zeros((len(items), k), np.int32)
                coeff_int = np.zeros((len(items), k), object)
                for t_row, (_, r) in enumerate(items):
                    for t, (i, v) in enumerate(r):
                        idx[t_row, t] = i
                        coeff_int[t_row, t] = v
                cf = FR.encode([int(coeff_int[a, b]) if coeff_int[a, b] else 0
                                for a in range(len(items)) for b in range(k)])
                mats.append((rids, idx, cf.reshape(len(items), k, FR.L)))
            out.append(mats)
        return out

    def witness(self) -> list[int]:
        assert all(v is not None for v in self.values), "missing assignments"
        return list(self.values)

    def check(self) -> bool:
        w = self.witness()
        return all(
            a.eval(w) * b.eval(w) % P == c.eval(w)
            for a, b, c in self.constraints
        )
