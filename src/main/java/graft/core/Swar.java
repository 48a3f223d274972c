package graft.core;

import java.lang.invoke.MethodHandles;
import java.lang.invoke.VarHandle;
import java.nio.ByteOrder;

/**
 * SWAR primitives for the byte-skip scanners. Java, not Scala, because
 * VarHandle's polymorphic-signature {@code get} needs an exact primitive
 * call-site descriptor ({@code (long) VH.get(...)}) that scalac cannot emit
 * without boxing.
 */
public final class Swar {
    private Swar() {}


    private static final VarHandle LONG_LE =
        MethodHandles.byteArrayViewVarHandle(long[].class, ByteOrder.LITTLE_ENDIAN);

    /** Read 8 little-endian bytes at {@code i} as one long (unaligned ok). */
    public static long readLongLE(byte[] buf, int i) {
        return (long) LONG_LE.get(buf, i);
    }

    /** High bit set in each byte lane of {@code x} that is zero (classic SWAR). */
    public static long zeros(long x) {
        return (x - 0x0101010101010101L) & ~x & 0x8080808080808080L;
    }

    /**
     * True iff all 8 bytes of {@code val} (a little-endian load of 8 text
     * bytes) are ASCII digits — the published SWAR digit test (Lemire,
     * "Number Parsing at a Gigabyte per Second", 2021; simdjson's
     * {@code is_made_of_eight_digits_fast}): the high nibble of every lane
     * must be 3, and adding 6 to a lane must not carry into the high
     * nibble (which catches {@code 0x3A..0x3F}, i.e. {@code ':'..'?'}).
     */
    public static boolean is8Digits(long val) {
        return ((val & 0xF0F0F0F0F0F0F0F0L)
                | (((val + 0x0606060606060606L) & 0xF0F0F0F0F0F0F0F0L) >>> 4))
               == 0x3333333333333333L;
    }

    /**
     * Decimal value of 8 ASCII digit bytes loaded little-endian (text
     * order: the FIRST text byte is the most significant digit) — the
     * published SWAR reduction (same source as {@link #is8Digits}): three
     * multiply-accumulate steps fold 8 lanes to pairs, pairs to quads,
     * quads to the final value.
     */
    public static int parse8Digits(long val) {
        val -= 0x3030303030303030L;
        val = (val * 10) + (val >>> 8);
        val = (((val & 0x000000FF000000FFL) * 0x000F424000000064L)
             + (((val >>> 16) & 0x000000FF000000FFL) * 0x0000271000000001L)) >>> 32;
        return (int) val;
    }

    /**
     * Pack the first {@code min(len, 8)} bytes at {@code off} into one
     * little-endian long, zero-padded — the short-key fingerprint used by
     * key-compare fast paths. Safe at end of buffer.
     */
    public static long packPrefix(byte[] buf, int off, int len) {
        int n = Math.min(len, 8);
        if (n == 0) return 0L;
        if (off + 8 <= buf.length) return readLongLE(buf, off) & (-1L >>> ((8 - n) << 3));
        long x = 0L;
        for (int k = n - 1; k >= 0; k--) x = (x << 8) | (buf[off + k] & 0xFFL);
        return x;
    }
}
