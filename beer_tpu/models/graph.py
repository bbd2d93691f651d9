"""HMM state graphs.

Reference parity: ``beer/models/graph.py`` (Graph, CompiledGraph):
an FST-like builder — states, weighted arcs, start/end states —
that ``normalize()``s arc weights into per-state transition
distributions and ``compile()``s to dense log-matrices consumed by the
scan-based recursions, plus the standard constructors the recipes use
(left-to-right unit HMMs, phone-loop composition).

The builder is plain Python (runs at trace time, shapes are static);
only :class:`CompiledGraph` is a pytree that enters jit.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

LOG_ZERO = -1e30


@struct.dataclass
class CompiledGraph:
    """Dense representation: what the scans consume.

    ``pdf_ids`` maps each state to its emission pdf index (< n_pdfs);
    several states may share one pdf (tied emissions).
    """

    log_init: jnp.ndarray    # (S,)
    log_final: jnp.ndarray   # (S,)
    log_trans: jnp.ndarray   # (S, S)
    pdf_ids: jnp.ndarray     # (S,) int32
    n_states: int = struct.field(pytree_node=False, default=0)
    n_pdfs: int = struct.field(pytree_node=False, default=0)
    # static structure hint: the (shared) transition matrix is pure
    # left-to-right (diagonal + first superdiagonal only) — lets decode
    # route through the O(B*S)-per-step banded Viterbi kernels.  Read
    # with getattr(..., False): pickled skeletons from before the field
    # existed lack it.
    l2r_banded: bool = struct.field(pytree_node=False, default=False)

    def expand_llh(self, per_pdf_llh: jnp.ndarray) -> jnp.ndarray:
        """(..., n_pdfs) per-pdf log-likelihoods → (..., S) per-state.

        Supports per-utterance graphs: ``pdf_ids`` (B, S) with
        ``per_pdf_llh`` (B, T, n_pdfs).  That case is a selection
        *matmul*: a strided gather along the minor (lane) axis of a
        (B, T, P) array is a per-element op on TPU, orders of magnitude
        slower than the equivalent batched MXU contraction.  HIGHEST
        precision keeps the selection bit-exact (one-hot rows pick
        single values; a default-precision pass bf16-rounds the llh).
        """
        if self.pdf_ids.ndim == 2:
            import jax

            one_hot = jax.nn.one_hot(
                self.pdf_ids, self.n_pdfs, dtype=per_pdf_llh.dtype
            )                                            # (B, S, P)
            return jnp.einsum(
                "btp,bsp->bts", per_pdf_llh, one_hot,
                precision=jax.lax.Precision.HIGHEST,
            )
        return per_pdf_llh[..., self.pdf_ids]


class Graph:
    """Mutable HMM-graph builder (host-side, pre-jit)."""

    def __init__(self):
        self._pdf_of_state: List[int] = []
        self._arcs: Dict[Tuple[int, int], float] = {}
        self._init: Dict[int, float] = {}
        self._final: Dict[int, float] = {}

    # -- construction ---------------------------------------------------
    def add_state(self, pdf_id: int) -> int:
        self._pdf_of_state.append(int(pdf_id))
        return len(self._pdf_of_state) - 1

    def add_arc(self, src: int, dst: int, weight: float = 1.0) -> None:
        self._arcs[(src, dst)] = self._arcs.get((src, dst), 0.0) + float(weight)

    def set_init(self, state: int, weight: float = 1.0) -> None:
        self._init[state] = float(weight)

    def set_final(self, state: int, weight: float = 1.0) -> None:
        self._final[state] = float(weight)

    @property
    def n_states(self) -> int:
        return len(self._pdf_of_state)

    # -- normalization + compilation -------------------------------------
    def normalize(self) -> None:
        """Scale outgoing arc weights (incl. final) to sum to 1 per state,
        and initial weights to sum to 1."""
        out_sums = [0.0] * self.n_states
        for (s, _), w in self._arcs.items():
            out_sums[s] += w
        for s, w in self._final.items():
            out_sums[s] += w
        for (s, d) in list(self._arcs):
            if out_sums[s] > 0:
                self._arcs[(s, d)] /= out_sums[s]
        for s in list(self._final):
            if out_sums[s] > 0:
                self._final[s] /= out_sums[s]
        z = sum(self._init.values())
        if z > 0:
            for s in list(self._init):
                self._init[s] /= z

    def compile(self, dtype=jnp.float32) -> CompiledGraph:
        n = self.n_states
        trans = np.full((n, n), LOG_ZERO, dtype=np.float64)
        init = np.full(n, LOG_ZERO, dtype=np.float64)
        final = np.full(n, LOG_ZERO, dtype=np.float64)
        for (s, d), w in self._arcs.items():
            if w > 0:
                trans[s, d] = math.log(w)
        for s, w in self._init.items():
            if w > 0:
                init[s] = math.log(w)
        for s, w in self._final.items():
            if w > 0:
                final[s] = math.log(w)
        pdf_ids = np.asarray(self._pdf_of_state, dtype=np.int32)
        n_pdfs = int(pdf_ids.max()) + 1 if n else 0
        return CompiledGraph(
            log_init=jnp.asarray(init, dtype),
            log_final=jnp.asarray(final, dtype),
            log_trans=jnp.asarray(trans, dtype),
            pdf_ids=jnp.asarray(pdf_ids),
            n_states=n,
            n_pdfs=n_pdfs,
        )


# ----------------------------------------------------------------------
# Standard constructors (reference CLI: ``beer hmm mkphones/mkphoneloop``)
# ----------------------------------------------------------------------
def left_to_right(n_states: int, first_pdf: int = 0, self_loop: float = 0.5) -> Graph:
    """A left-to-right unit HMM: self-loop + advance per state."""
    g = Graph()
    states = [g.add_state(first_pdf + i) for i in range(n_states)]
    for i, s in enumerate(states):
        g.add_arc(s, s, self_loop)
        if i + 1 < n_states:
            g.add_arc(s, states[i + 1], 1.0 - self_loop)
    g.set_init(states[0])
    g.set_final(states[-1], 1.0 - self_loop)
    g.normalize()
    return g


def ergodic(n_states: int, self_loop: float = 0.5) -> Graph:
    """Fully-connected HMM: every state reaches every state (plain HMM
    topologies of the reference notebooks; BASELINE config 2)."""
    g = Graph()
    states = [g.add_state(i) for i in range(n_states)]
    out = (1.0 - self_loop) / max(n_states - 1, 1)
    for s in states:
        for t in states:
            g.add_arc(s, t, self_loop if s == t else out)
        g.set_init(s)
        g.set_final(s, 0.1)
    g.normalize()
    return g


def phone_loop_graph(
    n_units: int,
    states_per_unit: int,
    self_loop: float = 0.5,
    lm_trans=None,
    lm_init=None,
) -> Graph:
    """N left-to-right unit HMMs in a loop.

    Unit u owns pdfs [u·P, (u+1)·P) and states likewise.  Every unit's
    last state connects to every unit's first state.  The loop-back arc
    weights default to uniform — the Bayesian prior over unit transitions
    (Dirichlet / SBCategorical) is applied on top by
    :class:`beer_tpu.models.phoneloop.PhoneLoop` at E-step time, keeping
    the graph fixed while the unit LM stays conjugate (reference:
    ``beer/models/phoneloop.py``).  For *recognition* decoding, pass a
    bigram language model instead: ``lm_trans`` (U, U) with
    ``lm_trans[u, v]`` ∝ P(next unit v | unit u) and ``lm_init`` (U,)
    ∝ P(first unit).
    """
    import numpy as np

    if lm_trans is None:
        lm_trans = np.full((n_units, n_units), 1.0 / n_units)
    if lm_init is None:
        lm_init = np.full(n_units, 1.0 / n_units)
    g = Graph()
    starts, ends = [], []
    for u in range(n_units):
        states = [g.add_state(u * states_per_unit + i) for i in range(states_per_unit)]
        for i, s in enumerate(states):
            g.add_arc(s, s, self_loop)
            if i + 1 < states_per_unit:
                g.add_arc(s, states[i + 1], 1.0 - self_loop)
        starts.append(states[0])
        ends.append(states[-1])
        g.set_init(states[0], float(lm_init[u]))
        g.set_final(states[-1], (1.0 - self_loop) * 0.5)
    exit_mass = (1.0 - self_loop) * 0.5
    for u, e in enumerate(ends):
        row = lm_trans[u] / max(float(np.sum(lm_trans[u])), 1e-30)
        for v, s in enumerate(starts):
            if row[v] > 0:
                g.add_arc(e, s, exit_mass * float(row[v]))
    g.normalize()
    return g


def bigram_lm(transcriptions, n_units: int, smoothing: float = 0.5):
    """ML bigram unit LM from transcriptions (add-``smoothing`` counts).

    Returns (lm_trans (U, U), lm_init (U,)) for :func:`phone_loop_graph`.
    """
    import numpy as np

    trans = np.full((n_units, n_units), smoothing)
    init = np.full(n_units, smoothing)
    for seq in transcriptions:
        if len(seq):
            init[seq[0]] += 1
        for a, b in zip(seq[:-1], seq[1:]):
            trans[a, b] += 1
    return trans / trans.sum(1, keepdims=True), init / init.sum()


def transcription_graphs(
    transcriptions,
    n_phones: int,
    states_per_phone: int,
    self_loop: float = 0.5,
    dtype=jnp.float32,
    shared: bool = True,
) -> CompiledGraph:
    """Per-utterance forced-alignment graphs from phone transcriptions.

    Reference parity: the supervised HMM-GMM training path (BASELINE
    config 3 / historical ``recipes/timit``): each utterance's graph is
    the left-to-right concatenation of its transcription's phone HMMs.
    All utterances share the pdf space (phone p owns pdfs [p·P, (p+1)·P)).

    ``shared=True`` (default, the fast path): every transcription's
    transition structure is the *same* left-to-right chain — only the
    state→pdf map and the final state differ — so one shared (S, S)
    matrix padded to the longest transcription serves the whole batch,
    with per-utterance ``log_final`` (B, S) and ``pdf_ids`` (B, S).
    This is **exact**: a shorter utterance's advance arc out of its last
    real state leads only into padding states that (a) never feed back
    into real states (left-to-right) and (b) carry zero final weight, so
    α over real states, β (padding β ≡ 0), log Z, γ and ξ are unchanged
    — while the E-step dispatches to the fused shared-graph kernels
    instead of the per-utterance ``lax.scan`` einsum fallback.

    ``shared=False`` materializes the per-utterance (B, S, S) matrices
    (the general path; kept for graphs whose *structure* truly differs
    and as the equivalence-test oracle).  Viterbi on either form is
    forced alignment.
    """
    import numpy as np

    p = states_per_phone
    b = len(transcriptions)
    s_max = max(len(t) for t in transcriptions) * p
    final = np.full((b, s_max), LOG_ZERO)
    pdf_ids = np.zeros((b, s_max), np.int32)
    log_sl = math.log(self_loop)
    log_adv = math.log(1.0 - self_loop)
    for i, phones in enumerate(transcriptions):
        n_states = len(phones) * p
        for j in range(n_states):
            pdf_ids[i, j] = phones[j // p] * p + (j % p)
        final[i, n_states - 1] = log_adv
    if shared:
        trans = np.full((s_max, s_max), LOG_ZERO)
        for j in range(s_max):
            trans[j, j] = log_sl
            if j + 1 < s_max:
                trans[j, j + 1] = log_adv
        init = np.full(s_max, LOG_ZERO)
        init[0] = 0.0
    else:
        trans = np.full((b, s_max, s_max), LOG_ZERO)
        init = np.full((b, s_max), LOG_ZERO)
        for i, phones in enumerate(transcriptions):
            n_states = len(phones) * p
            for j in range(n_states):
                trans[i, j, j] = log_sl
                if j + 1 < n_states:
                    trans[i, j, j + 1] = log_adv
            init[i, 0] = 0.0
    return CompiledGraph(
        log_init=jnp.asarray(init, dtype),
        log_final=jnp.asarray(final, dtype),
        log_trans=jnp.asarray(trans, dtype),
        pdf_ids=jnp.asarray(pdf_ids),
        n_states=s_max,
        n_pdfs=n_phones * p,
        l2r_banded=shared,
    )
