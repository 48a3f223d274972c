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
