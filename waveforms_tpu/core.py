"""`Waveform` and `WaveVStack`: the user-facing piecewise-waveform objects.

A :class:`Waveform` is an immutable-ish container of the piecewise IR
(``bounds``/``seq``; see :mod:`waveforms_tpu.ir`) plus optional sampling
metadata (``start``/``stop``/``sample_rate``), clip limits, and an SOS filter
chain.  All arithmetic stays symbolic; nothing touches a sample grid until
``sample()``/``__call__``.

A :class:`WaveVStack` is a lazy vertical stack of N component waveforms --
the channel-batching primitive: ``+`` and ``>>`` are O(1) (stored offsets),
and sampling accumulates all components into one buffer.  On TPU a stack maps
to a ``(channels, samples)`` batched kernel launch (see
``waveforms_tpu.ops.pallas_synth``).

API and wire formats match the reference implementation
(``/root/reference/waveforms/waveform.py:125-895``); the flat-list and tree
serializations round-trip bit-for-bit.
"""

from __future__ import annotations

from typing import Generator, Iterable, cast

import numpy as np
from numpy import inf
from numpy.typing import NDArray

from .ir.algebra import NDIGITS, ZERO, add, const as _const, mul, \
    pow as _pow, shift as _shift
from .ir.canonical import filter as _filter_expr, simplify as _simplify_expr
from .ir.piecewise import calc_parts, merge_piecewise, wave_sum
from .ir.registry import baseFunc
from .utils.latexfmt import expr_latex, num_latex

_ONE = _const(1.0)


class Waveform:
    __slots__ = ('bounds', 'seq', 'max', 'min', 'start', 'stop',
                 'sample_rate', 'filters', 'label')

    def __init__(self, bounds=(+inf,), seq=(ZERO,), min=-inf, max=inf):
        self.bounds = bounds
        self.seq = seq
        self.max = max
        self.min = min
        self.start = None
        self.stop = None
        self.sample_rate = None
        self.filters: tuple[np.ndarray, float] | None = None
        self.label = None

    # -- extent ------------------------------------------------------------

    @staticmethod
    def _begin(bounds, seq):
        """Lower edge of the first non-zero segment (-inf if unbounded)."""
        for i, s in enumerate(seq):
            if s != ZERO:
                return -inf if i == 0 else bounds[i - 1]
        return inf

    @staticmethod
    def _end(bounds, seq):
        """Upper edge of the last non-zero segment (+inf if unbounded)."""
        n = len(bounds)
        for i, s in enumerate(seq[::-1]):
            if s != ZERO:
                return inf if i == 0 else bounds[n - i - 1]
        return -inf

    @property
    def begin(self):
        b = self._begin(self.bounds, self.seq)
        return b if self.start is None else max(self.start, b)

    @property
    def end(self):
        e = self._end(self.bounds, self.seq)
        return e if self.stop is None else min(self.stop, e)

    # -- sampling (host oracle path) ----------------------------------------

    def sample(
        self,
        sample_rate=None,
        out: np.ndarray | None = None,
        chunk_size=None,
        function_lib=None,
        filters: tuple[np.ndarray, float] | None = None,
    ) -> np.ndarray | Iterable[np.ndarray]:
        """Sample on ``arange(start, stop, 1/sample_rate)``.

        With ``chunk_size`` set, returns a generator of chunks with IIR
        filter state carried across chunk boundaries (streaming AWG upload).
        """
        if sample_rate is None:
            sample_rate = self.sample_rate
        if self.start is None or self.stop is None or sample_rate is None:
            raise ValueError(
                f'Waveform is not initialized. {self.start=}, {self.stop=}, '
                f'{sample_rate=}')
        if filters is None:
            filters = self.filters
        if chunk_size is not None:
            return self._sample_iter(sample_rate, chunk_size, out,
                                     function_lib, filters)
        x = np.arange(self.start, self.stop, 1 / sample_rate)
        sig = cast(np.ndarray,
                   self.__call__(x, out=out, function_lib=function_lib))
        if filters is not None:
            from scipy.signal import sosfilt
            sos, initial = filters
            sos = np.array(sos) if not isinstance(sos, np.ndarray) else (
                sos.copy() if not sos.flags.writeable else sos)
            if initial:
                sig = cast(np.ndarray, sosfilt(sos, sig - initial)) + initial
            else:
                sig = cast(np.ndarray, sosfilt(sos, sig))
        return sig

    def _sample_iter(
        self, sample_rate, chunk_size, out: np.ndarray | None, function_lib,
        filters: tuple[np.ndarray, float] | None,
    ) -> Generator[np.ndarray, None, None]:
        start = cast(float, self.start)
        start_n = 0
        if filters is not None:
            sos, initial = filters
            sos = np.array(sos) if not isinstance(sos, np.ndarray) else (
                sos.copy() if not sos.flags.writeable else sos)
            zi = np.zeros((sos.shape[0], 2))
        length = chunk_size / sample_rate
        while start < cast(float, self.stop):
            if start + length > cast(float, self.stop):
                stop = cast(float, self.stop)
                size = round((stop - start) * sample_rate)
            else:
                stop = start + length
                size = chunk_size
            x = np.linspace(start, stop, size, endpoint=False)

            if filters is None:
                if out is not None:
                    yield cast(np.ndarray,
                               self.__call__(x, out=out[start_n:],
                                             function_lib=function_lib))
                else:
                    yield cast(np.ndarray,
                               self.__call__(x, function_lib=function_lib))
            else:
                from scipy.signal import sosfilt
                sig = cast(np.ndarray,
                           self.__call__(x, function_lib=function_lib))
                if initial:
                    sig -= initial
                sig, zi = sosfilt(sos, sig, zi=zi)
                if initial:
                    sig += initial
                if out is not None:
                    out[start_n:start_n + size] = sig
                yield cast(np.ndarray, sig)

            start = stop
            start_n += chunk_size

    # -- serialization -------------------------------------------------------
    # Flat-list wire format, recursive segment encoding
    # (cf. /root/reference/waveforms/waveform.py:259-382): per waveform
    #   [nseg, (bound, nsum, (amp, nmul, (n, nfun, *fun))*)*]

    @staticmethod
    def _tolist(bounds, seq, ret=None):
        if ret is None:
            ret = []
        ret.append(len(bounds))
        for expr, b in zip(seq, bounds):
            ret.append(b)
            terms, amps = expr
            ret.append(len(amps))
            for term, amp in zip(terms, amps):
                ret.append(amp)
                factors, powers = term
                ret.append(len(powers))
                for fun, n in zip(factors, powers):
                    ret.append(n)
                    ret.append(len(fun))
                    ret.extend(fun)
        return ret

    @staticmethod
    def _fromlist(l, pos=0):

        def take(count):
            nonlocal pos
            try:
                chunk = tuple(l[pos:pos + count])
            except Exception:
                raise ValueError('Invalid waveform format')
            pos += count
            return chunk

        (nseg,) = take(1)
        bounds, seq = [], []
        for _ in range(nseg):
            b, nsum = take(2)
            bounds.append(b)
            amps, terms = [], []
            for _ in range(nsum):
                amp, nmul = take(2)
                amps.append(amp)
                powers, factors = [], []
                for _ in range(nmul):
                    n, nfun = take(2)
                    powers.append(n)
                    factors.append(take(nfun))
                terms.append((tuple(factors), tuple(powers)))
            seq.append((tuple(terms), tuple(amps)))

        return tuple(bounds), tuple(seq), pos

    def tolist(self):
        l = [self.max, self.min, self.start, self.stop, self.sample_rate]
        if self.filters is None:
            l.append(None)
        else:
            sos, initial = self.filters
            flat = list(np.asarray(sos).reshape(-1))
            l.append(len(flat))
            l.extend(flat)
            l.append(initial)
        return self._tolist(self.bounds, self.seq, l)

    @classmethod
    def fromlist(cls, l):
        w = cls()
        pos = 6
        (w.max, w.min, w.start, w.stop, w.sample_rate, sos_size) = l[:pos]
        if sos_size is not None:
            sos = np.array(l[pos:pos + sos_size]).reshape(-1, 6)
            pos += sos_size
            initial = l[pos]
            pos += 1
            w.filters = sos, initial
        w.bounds, w.seq, pos = cls._fromlist(l, pos)
        return w

    def totree(self):
        header = (self.max, self.min, self.start, self.stop,
                  self.sample_rate, self.filters)
        body = []
        for expr, b in zip(self.seq, self.bounds):
            terms, amps = expr
            new_seq = []
            for term, amp in zip(terms, amps):
                factors, powers = term
                new_seq.append((amp, tuple(zip(powers, factors))))
            body.append((b, tuple(new_seq)))
        return header, tuple(body)

    @staticmethod
    def fromtree(tree):
        w = Waveform()
        header, body = tree
        (w.max, w.min, w.start, w.stop, w.sample_rate, w.filters) = header
        bounds, seqs = [], []
        for b, seg in body:
            bounds.append(b)
            amps, terms = [], []
            for amp, term in seg:
                amps.append(amp)
                powers, factors = [], []
                for n, fun in term:
                    powers.append(n)
                    factors.append(fun)
                terms.append((tuple(factors), tuple(powers)))
            seqs.append((tuple(terms), tuple(amps)))
        w.bounds = tuple(bounds)
        w.seq = tuple(seqs)
        return w

    # -- canonicalization ----------------------------------------------------

    def simplify(self, eps=1e-15):
        """Canonicalize every segment; coalesce equal adjacent segments."""
        seq = [_simplify_expr(self.seq[0], eps)]
        bounds = [self.bounds[0]]
        for expr, b in zip(self.seq[1:], self.bounds[1:]):
            expr = _simplify_expr(expr, eps)
            if expr == seq[-1]:
                seq.pop()
                bounds.pop()
            seq.append(expr)
            bounds.append(b)
        return Waveform(tuple(bounds), tuple(seq))

    def filter(self, low=0, high=inf, eps=1e-15):
        """Band-pass by carrier frequency, per segment."""
        return Waveform(self.bounds,
                        tuple(_filter_expr(expr, low, high, eps)
                              for expr in self.seq))

    # -- algebra -------------------------------------------------------------

    def _comb(self, other: 'Waveform', oper) -> 'Waveform':
        return Waveform(*merge_piecewise(self.bounds, self.seq, other.bounds,
                                         other.seq, oper))

    def __pow__(self, n) -> 'Waveform':
        return Waveform(self.bounds, tuple(_pow(w, n) for w in self.seq))

    def __add__(self, other) -> 'Waveform':
        if isinstance(other, Waveform):
            return self._comb(other, add)
        return self + const(other)

    def __radd__(self, v) -> 'Waveform':
        return const(v) + self

    def __mul__(self, other) -> 'Waveform':
        if isinstance(other, Waveform):
            return self._comb(other, mul)
        return self * const(other)

    def __rmul__(self, v) -> 'Waveform':
        return const(v) * self

    def __truediv__(self, other) -> 'Waveform':
        if isinstance(other, Waveform):
            raise TypeError('division by waveform')
        return self * const(1 / other)

    def __neg__(self) -> 'Waveform':
        return -1 * self

    def __sub__(self, other) -> 'Waveform':
        return self + (-other)

    def __rsub__(self, v) -> 'Waveform':
        return v + (-self)

    def __rshift__(self, time) -> 'Waveform':
        return Waveform(
            tuple(round(b + time, NDIGITS) for b in self.bounds),
            tuple(_shift(expr, time) for expr in self.seq))

    def __lshift__(self, time) -> 'Waveform':
        return self >> (-time)

    # -- boolean/marker helpers ----------------------------------------------

    def __ior__(self, other) -> 'Waveform':
        return self | other

    def __or__(self, other) -> 'Waveform':
        if isinstance(other, (int, float, complex)):
            other = const(other)

        def _or(a, b):
            return _ONE if (a != ZERO or b != ZERO) else ZERO

        return self._comb(other, _or)

    def __iand__(self, other) -> 'Waveform':
        return self & other

    def __and__(self, other) -> 'Waveform':
        if isinstance(other, (int, float, complex)):
            other = const(other)

        def _and(a, b):
            return _ONE if (a != ZERO and b != ZERO) else ZERO

        return self._comb(other, _and)

    @property
    def marker(self) -> 'Waveform':
        """0/1 indicator of where the (simplified) waveform is non-zero."""
        w = self.simplify()
        return Waveform(w.bounds,
                        tuple(ZERO if s == ZERO else _ONE for s in w.seq))

    def mask(self, edge: float = 0) -> 'Waveform':
        """Marker eroded by *edge* on both sides of every active region."""
        w = self.marker
        in_wave = w.seq[0] == ZERO
        bounds: list = []
        seq: list = []

        if w.seq[0] == ZERO:
            in_wave = False
            bounds.append(w.bounds[0] - edge)
            seq.append(ZERO)

        for b, s in zip(w.bounds[1:], w.seq[1:]):
            if not in_wave and s != ZERO:
                in_wave = True
                bounds.append(b + edge)
                seq.append(_ONE)
            elif in_wave and s == ZERO:
                in_wave = False
                b = b - edge
                if b > bounds[-1]:
                    bounds.append(b)
                    seq.append(ZERO)
                else:
                    bounds.pop()
                    bounds.append(b)
        return Waveform(tuple(bounds), tuple(seq))

    # -- evaluation ------------------------------------------------------------

    @staticmethod
    def _fill_parts(parts, out):
        for start, stop, part in parts:
            out[start:stop] += part

    def __call__(
        self,
        x,
        frag=False,
        out: np.ndarray | list | None = None,
        accumulate=False,
        function_lib=None,
    ):
        """Evaluate on sample grid *x* (numpy oracle path).

        ``frag=True`` returns the raw non-zero parts list instead of a dense
        array.  ``out=``/``accumulate=`` allow writing into a caller buffer.
        """
        if function_lib is None:
            function_lib = baseFunc
        if isinstance(x, (int, float, complex)):
            return cast(
                NDArray[np.float64],
                self.__call__(np.array([x]), function_lib=function_lib))[0]
        parts, dtype = calc_parts(self.bounds, self.seq, x, function_lib,
                                  self.min, self.max)
        if frag:
            if out is None:
                return cast(list, parts)
            out = cast(list, out)
            if accumulate:
                raise NotImplementedError('merging fragment lists')
            out.clear()
            out.extend(parts)
            return out
        if out is None:
            out = np.zeros_like(x, dtype=dtype)
        elif not accumulate:
            out *= 0
        self._fill_parts(parts, out)
        return out

    # -- identity ---------------------------------------------------------------

    def __hash__(self):
        return hash((self.max, self.min, self.start, self.stop,
                     self.sample_rate, self.bounds, self.seq))

    def __eq__(self, o: object) -> bool:
        if isinstance(o, (int, float, complex)):
            return self == const(o)
        if isinstance(o, Waveform):
            a = self.simplify()
            b = o.simplify()
            return (a.seq == b.seq and a.bounds == b.bounds
                    and (a.max, a.min, a.start, a.stop)
                    == (b.max, b.min, b.start, b.stop))
        return False

    def _repr_latex_(self):
        parts = []
        start = -np.inf
        for end, expr in zip(self.bounds, self.seq):
            parts.append(expr_latex(expr) + r",~~&t\in" +
                         f"({num_latex(start)},{num_latex(end)}" +
                         (']' if end < np.inf else ')'))
            start = end
        if len(parts) == 1:
            body = ''.join(['f(t)=', *parts[0].split('&')])
        else:
            body = '\n'.join([
                r"f(t)=\begin{cases}", (r"\\" + '\n').join(parts),
                r"\end{cases}"
            ])
        return "$$\n{}\n$$".format(body)

    # -- audio ---------------------------------------------------------------

    def _play(self, time_unit, volume=1.0):
        import pyaudio

        CHUNK = 1024
        RATE = 48000
        dynamic_volume = 1.0
        amp = 2**15 * 0.999 * volume * dynamic_volume

        p = pyaudio.PyAudio()
        try:
            stream = p.open(format=pyaudio.paInt16, channels=1, rate=RATE,
                            output=True)
            try:
                for data in self.sample(sample_rate=RATE / time_unit,
                                        chunk_size=CHUNK):
                    lim = np.abs(data).max()
                    if lim > 0 and dynamic_volume > 1.0 / lim:
                        dynamic_volume = 1.0 / lim
                        amp = 2**15 * 0.99 * volume * dynamic_volume
                    stream.write(bytes((amp * data).astype(np.int16).data))
            finally:
                stream.stop_stream()
                stream.close()
        finally:
            p.terminate()

    def play(self, time_unit=1, volume=1.0):
        import multiprocessing as mp
        mp.Process(target=self._play, args=(time_unit, volume),
                   daemon=True).start()


class WaveVStack(Waveform):
    """Lazy vertical stack of component waveforms (the batching primitive).

    Components are held un-merged; ``+`` extends the list and ``>>`` stores a
    scalar shift, both O(1).  Sampling accumulates every component into a
    single complex buffer and returns its real part
    (cf. /root/reference/waveforms/waveform.py:638-844).
    """

    def __init__(self, wlist: Iterable[Waveform] = ()):
        self.wlist = [(w.bounds, w.seq) for w in wlist]
        self.start = None
        self.stop = None
        self.sample_rate = None
        self.offset = 0
        self.shift = 0
        self.filters = None
        self.label = None
        self.function_lib = None

    def _stack_begin(self):
        if self.wlist:
            return min(self._begin(b, s) for b, s in self.wlist)
        return -inf

    def _stack_end(self):
        if self.wlist:
            return max(self._end(b, s) for b, s in self.wlist)
        return inf

    @property
    def begin(self):
        b = self._stack_begin()
        return b if self.start is None else max(self.start, b)

    @property
    def end(self):
        e = self._stack_end()
        return e if self.stop is None else min(self.stop, e)

    def __call__(self, x, frag=False, out=None, function_lib=None):
        assert frag is False, 'WaveVStack does not support frag mode'
        out = np.full_like(x, self.offset, dtype=np.complex128)
        if self.shift != 0:
            x = x - self.shift
        if function_lib is None:
            function_lib = (baseFunc if self.function_lib is None
                            else self.function_lib)
        for bounds, seq in self.wlist:
            parts, _ = calc_parts(bounds, seq, x, function_lib)
            self._fill_parts(parts, out)
        return out.real

    def tolist(self):
        l = [self.start, self.stop, self.offset, self.shift,
             self.sample_rate]
        if self.filters is None:
            l.append(None)
        else:
            sos, initial = self.filters
            flat = list(np.asarray(sos).reshape(-1))
            l.append(len(flat))
            l.extend(flat)
            l.append(initial)
        l.append(len(self.wlist))
        for bounds, seq in self.wlist:
            self._tolist(bounds, seq, l)
        return l

    @classmethod
    def fromlist(cls, l):
        w = cls()
        pos = 6
        w.start, w.stop, w.offset, w.shift, w.sample_rate, sos_size = l[:pos]
        if sos_size is not None:
            sos = np.array(l[pos:pos + sos_size]).reshape(-1, 6)
            pos += sos_size
            initial = l[pos]
            pos += 1
            w.filters = sos, initial
        n = l[pos]
        pos += 1
        for _ in range(n):
            bounds, seq, pos = cls._fromlist(l, pos)
            w.wlist.append((bounds, seq))
        return w

    def simplify(self, eps=1e-15):
        """Collapse the stack into one canonical :class:`Waveform`."""
        if not self.wlist:
            return zero()
        bounds, seq = wave_sum(self.wlist)
        wav = Waveform(bounds=bounds, seq=seq)
        if self.offset != 0:
            wav += self.offset
        if self.shift != 0:
            wav >>= self.shift
        wav = wav.simplify(eps)
        wav.start = self.start
        wav.stop = self.stop
        wav.sample_rate = self.sample_rate
        wav.filters = self.filters
        wav.label = self.label
        return wav

    @staticmethod
    def _rshift(wlist, time):
        if time == 0:
            return wlist
        return [(tuple(round(b + time, NDIGITS) for b in bounds),
                 tuple(_shift(expr, time) for expr in seq))
                for bounds, seq in wlist]

    def _clone_meta(self, ret: 'WaveVStack') -> 'WaveVStack':
        ret.filters = self.filters
        ret.label = self.label
        return ret

    def __rshift__(self, time):
        ret = WaveVStack()
        ret.wlist = self.wlist
        ret.sample_rate = self.sample_rate
        ret.start = self.start
        ret.stop = self.stop
        ret.shift = self.shift + time
        ret.offset = self.offset
        return self._clone_meta(ret)

    def __add__(self, other) -> 'WaveVStack':
        ret = WaveVStack()
        ret.wlist.extend(self.wlist)
        if isinstance(other, WaveVStack):
            if other.shift != self.shift:
                ret.wlist = self._rshift(ret.wlist, self.shift)
                ret.wlist.extend(self._rshift(other.wlist, other.shift))
            else:
                ret.wlist.extend(other.wlist)
            ret.offset = self.offset + other.offset
        elif isinstance(other, Waveform):
            other <<= self.shift
            ret.wlist.append((other.bounds, other.seq))
        else:
            ret.offset += other
        return self._clone_meta(ret)

    def __radd__(self, v) -> 'WaveVStack':
        return self + v

    def __mul__(self, other) -> 'WaveVStack':
        if isinstance(other, Waveform):
            other = other.simplify() << self.shift
            ret = WaveVStack([Waveform(*w) * other for w in self.wlist])
            if self.offset != 0:
                w = other * self.offset
                ret.wlist.append((w.bounds, w.seq))
        else:
            ret = WaveVStack([Waveform(*w) * other for w in self.wlist])
            ret.offset = self.offset * other
        return self._clone_meta(ret)

    def __rmul__(self, v) -> 'WaveVStack':
        return self * v

    def __eq__(self, other) -> bool:
        if self.wlist:
            return False
        return zero() == other

    __hash__ = None  # type: ignore[assignment]

    def _repr_latex_(self):
        return r"\sum_{i=1}^{" + f"{len(self.wlist)}" + r"}" + r"f_i(t)"

    def __getstate__(self) -> tuple:
        function_lib = self.function_lib
        if function_lib:
            try:
                import dill
                function_lib = dill.dumps(function_lib)
            except Exception:
                function_lib = None
        return (self.wlist, self.start, self.stop, self.sample_rate,
                self.offset, self.shift, self.filters, self.label,
                function_lib)

    def __setstate__(self, state: tuple) -> None:
        (self.wlist, self.start, self.stop, self.sample_rate, self.offset,
         self.shift, self.filters, self.label, function_lib) = state
        if function_lib:
            try:
                import dill
                function_lib = dill.loads(function_lib)
            except Exception:
                function_lib = None
        self.function_lib = function_lib


_zero_waveform = Waveform()
_one_waveform = Waveform(seq=(_ONE,))


def zero() -> Waveform:
    return _zero_waveform


def one() -> Waveform:
    return _one_waveform


def const(c) -> Waveform:
    return Waveform(seq=(_const(1.0 * c),))


def play(data, rate=48000):
    """Blocking playback of a pre-sampled buffer through pyaudio."""
    import io

    import pyaudio

    CHUNK = 1024
    max_amp = np.max(np.abs(data))
    if max_amp > 1:
        data /= max_amp

    data = np.array(2**15 * 0.999 * data, dtype=np.int16)
    buff = io.BytesIO(data.data)
    p = pyaudio.PyAudio()
    try:
        stream = p.open(format=pyaudio.paInt16, channels=1, rate=rate,
                        output=True)
        try:
            while True:
                chunk = buff.read(CHUNK)
                if not chunk:
                    break
                stream.write(chunk)
        finally:
            stream.stop_stream()
            stream.close()
    finally:
        p.terminate()
