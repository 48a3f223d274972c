package graft.core;

import java.math.BigInteger;

/**
 * Exactly-rounded decimal-to-double conversion via the Eisel-Lemire
 * algorithm (Lemire, "Number Parsing at a Gigabyte per Second", 2021; the
 * same published algorithm used by Go's strconv and Rust's core). The
 * parser already knows the token layout ({@code decIdx}/{@code expIdx}),
 * so conversion runs straight off the zero-copy view with no String
 * round-trip; the rare ambiguous cases (>19 significant digits, exponent
 * out of table range, a truncated-product tie) fall back to
 * {@link Double#parseDouble}, keeping results bit-identical to the JDK.
 *
 * Java, not Scala: the hot path needs {@link Math#multiplyHigh} plus
 * unsigned long arithmetic, which is clearer and faster here.
 */
public final class FastDouble {
    private FastDouble() {}

    private static final int MIN_EXP10 = -348;
    private static final int MAX_EXP10 = 347;
    // 128-bit truncated, normalized (top bit set) mantissas of 10^e
    private static final long[] POW10_HI = new long[MAX_EXP10 - MIN_EXP10 + 1];
    private static final long[] POW10_LO = new long[MAX_EXP10 - MIN_EXP10 + 1];

    static {
        BigInteger TEN = BigInteger.TEN;
        for (int e = MIN_EXP10; e <= MAX_EXP10; e++) {
            BigInteger m;
            if (e >= 0) {
                m = TEN.pow(e);
                int s = m.bitLength();
                m = s <= 128 ? m.shiftLeft(128 - s) : m.shiftRight(s - 128); // truncates
            } else {
                BigInteger d = TEN.pow(-e);
                // 2^(127+bits(d)) / d is always in [2^127, 2^128) for non-power-of-2 d
                m = BigInteger.ONE.shiftLeft(127 + d.bitLength()).divide(d); // truncates
            }
            POW10_HI[e - MIN_EXP10] = m.shiftRight(64).longValue();
            POW10_LO[e - MIN_EXP10] = m.longValue();
        }
    }

    // exact powers of ten as doubles (10^22 is the largest exact one)
    private static final double[] POW10D = {
        1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
        1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};

    private static long unsignedMulHi(long a, long b) {
        // Math.unsignedMultiplyHigh is JDK 18+; derive from the signed high word
        return Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a);
    }

    /**
     * Eisel-Lemire core: the correctly-rounded double nearest w * 10^q, or
     * NaN when the algorithm cannot decide (caller falls back; finite
     * decimal text never legitimately parses to NaN, so it is a safe
     * sentinel).
     */
    public static double tryEiselLemire(long w, int q, boolean neg) {
        if (w == 0) return neg ? -0.0 : 0.0;
        if (q < MIN_EXP10 || q > MAX_EXP10) return Double.NaN;
        int lz = Long.numberOfLeadingZeros(w);
        long man = w << lz;
        long po10Hi = POW10_HI[q - MIN_EXP10];
        long po10Lo = POW10_LO[q - MIN_EXP10];
        long exp2 = (long) ((217706 * q >> 16) + 64 + 1023) - lz;
        long xHi = unsignedMulHi(man, po10Hi);
        long xLo = man * po10Hi;
        if ((xHi & 0x1FF) == 0x1FF && Long.compareUnsigned(xLo + man, man) < 0) {
            // truncated 128-bit power may not suffice: refine with the low word
            long yHi = unsignedMulHi(man, po10Lo);
            long yLo = man * po10Lo;
            long mergedHi = xHi;
            long mergedLo = xLo + yHi;
            if (Long.compareUnsigned(mergedLo, xLo) < 0) mergedHi++;
            if ((mergedHi & 0x1FF) == 0x1FF && mergedLo + 1 == 0
                    && Long.compareUnsigned(yLo + man, man) < 0)
                return Double.NaN;
            xHi = mergedHi;
            xLo = mergedLo;
        }
        long msb = xHi >>> 63;
        long mantissa = xHi >>> (msb + 9);
        exp2 -= 1 ^ msb;
        if (xLo == 0 && (xHi & 0x1FF) == 0 && (mantissa & 3) == 1)
            return Double.NaN; // round-to-even tie cannot be resolved here
        mantissa = (mantissa + (mantissa & 1)) >>> 1;
        if ((mantissa >>> 53) > 0) {
            mantissa >>>= 1;
            exp2++;
        }
        if (Long.compareUnsigned(exp2 - 1, 0x7FF - 1) >= 0)
            return Double.NaN; // subnormal or overflow: defer to the JDK
        long bits = (exp2 << 52) | (mantissa & 0x000FFFFFFFFFFFFFL);
        if (neg) bits |= 0x8000000000000000L;
        return Double.longBitsToDouble(bits);
    }

    /**
     * Parse a JSON number token (grammar already validated by the parser;
     * {@code decIdx}/{@code expIdx} are the indices of '.' and 'e'/'E' or
     * -1) into the exactly-rounded nearest double.
     */
    public static double parse(CharSequence t, int decIdx, int expIdx) {
        int n = t.length();
        boolean neg = t.charAt(0) == '-';
        int digEnd = expIdx >= 0 ? expIdx : n;
        long w = 0;
        int sig = 0; // significant digits accumulated (after leading zeros)
        for (int j = neg ? 1 : 0; j < digEnd; j++) {
            char c = t.charAt(j);
            if (c == '.') continue;
            if (sig == 0 && c == '0') continue; // leading zeros are not significant
            if (sig == 19) return slow(t); // w would overflow 2^64
            w = w * 10 + (c - '0');
            sig++;
        }
        int q = decIdx >= 0 ? -(digEnd - decIdx - 1) : 0;
        if (expIdx >= 0) {
            int j = expIdx + 1;
            char c = t.charAt(j);
            boolean eneg = c == '-';
            if (c == '-' || c == '+') j++;
            long e = 0;
            for (; j < n && e < 100000; j++) e = e * 10 + (t.charAt(j) - '0');
            q += (int) (eneg ? -e : e);
        }
        // Clinger fast path (Clinger 1990, "How to read floating point
        // numbers accurately"): w < 2^53 and |q| <= 22 mean both w and
        // 10^|q| are exactly-representable doubles, so a single multiply
        // or divide performs ONE rounding of the exact real value —
        // correctly rounded by IEEE semantics, bit-identical to the JDK.
        // This covers virtually all real-world decimals ("0.5", "123.45")
        // including the exact-halfway cases Eisel-Lemire's truncated-
        // product tie check cannot decide (12% of a money-like corpus).
        if (w >>> 53 == 0 && q >= -22 && q <= 22) {
            double v = q >= 0 ? (double) w * POW10D[q] : (double) w / POW10D[-q];
            return neg ? -v : v;
        }
        double r = tryEiselLemire(w, q, neg);
        return Double.isNaN(r) ? slow(t) : r;
    }

    private static double slow(CharSequence t) {
        return Double.parseDouble(t.toString());
    }

    /**
     * Byte-slice specialization of {@link #parse(CharSequence, int, int)}
     * for the parser's zero-copy views: identical logic over the raw
     * buffer (no per-digit virtual {@code charAt}); {@code decIdx}/{@code
     * expIdx} are relative to {@code off}. Bit-identical results
     * (FastDoubleSpec covers both entry points).
     */
    public static double parse(byte[] b, int off, int n, int decIdx, int expIdx) {
        boolean neg = b[off] == '-';
        int digEnd = expIdx >= 0 ? expIdx : n;
        // The token's grammar is already validated (parseNumToken), so the
        // two digit segments — integer [p0, pDec) and fraction
        // (pDec, digEnd) — are pure ASCII digits and the mantissa can be
        // accumulated 8 digits per step (SWAR) instead of one. Leading
        // zeros accumulate harmlessly (w stays 0), so significance is
        // counted up front: total digits minus the leading-zero run
        // (with '.' transparent); > 19 significant digits defers to the
        // slow path exactly like the per-digit loop's sig cap did. At 19
        // digits w may exceed Long.MAX_VALUE — everything downstream
        // (Clinger's >>> 53 check, Eisel-Lemire) treats w as unsigned,
        // and two's-complement mul/add are bit-identical to unsigned.
        int p0 = neg ? 1 : 0;
        int pDec = decIdx >= 0 ? decIdx : digEnd;
        int totalDigits = (pDec - p0) + (decIdx >= 0 ? digEnd - decIdx - 1 : 0);
        int lead = 0;
        for (int j = p0; j < digEnd; j++) {
            byte c = b[off + j];
            if (c == '0') lead++;
            else if (c != '.') break;
        }
        if (totalDigits - lead > 19) return slowBytes(b, off, n);
        long w = 0;
        int j = off + p0, end = off + pDec;
        while (end - j >= 8) {
            w = w * 100000000L + Swar.parse8Digits(Swar.readLongLE(b, j));
            j += 8;
        }
        while (j < end) { w = w * 10 + (b[j] - '0'); j++; }
        if (decIdx >= 0) {
            j = off + decIdx + 1;
            end = off + digEnd;
            while (end - j >= 8) {
                w = w * 100000000L + Swar.parse8Digits(Swar.readLongLE(b, j));
                j += 8;
            }
            while (j < end) { w = w * 10 + (b[j] - '0'); j++; }
        }
        int q = decIdx >= 0 ? -(digEnd - decIdx - 1) : 0;
        if (expIdx >= 0) {
            int k = expIdx + 1;
            byte c = b[off + k];
            boolean eneg = c == '-';
            if (c == '-' || c == '+') k++;
            long e = 0;
            for (; k < n && e < 100000; k++) e = e * 10 + (b[off + k] - '0');
            q += (int) (eneg ? -e : e);
        }
        if (w >>> 53 == 0 && q >= -22 && q <= 22) {
            double v = q >= 0 ? (double) w * POW10D[q] : (double) w / POW10D[-q];
            return neg ? -v : v;
        }
        double r = tryEiselLemire(w, q, neg);
        return Double.isNaN(r) ? slowBytes(b, off, n) : r;
    }

    private static double slowBytes(byte[] b, int off, int n) {
        // number tokens are pure ASCII: a latin-1 String copy is exact
        return Double.parseDouble(new String(b, off, n, java.nio.charset.StandardCharsets.ISO_8859_1));
    }
}
