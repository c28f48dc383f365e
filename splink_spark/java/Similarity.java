package splinkspark;

import java.util.HashMap;
import java.util.HashSet;
import org.apache.spark.sql.api.java.UDF2;

/**
 * JVM-side similarity kernels for the hot scoring path.
 *
 * Native replacement for the reference's Scala UDF jar
 * (splink/internals/spark/jar_location.py:42-64): jaro_sim, jaro_winkler,
 * jaccard, damerau_levenshtein. Definitions are pinned to DuckDB's built-ins
 * (jaro_similarity, jaro_winkler_similarity, jaccard, damerau_levenshtein)
 * and mirror the Python kernels in internals/functions.py exactly; the
 * pandas UDFs remain as the fallback when this jar cannot be compiled, and
 * the DuckDB correctness oracle agrees with both.
 *
 * Each UDF2 wrapper returns null on null input, matching the pandas kernels'
 * null passthrough.
 */
public final class Similarity {

    private Similarity() {}

    /**
     * All kernels operate on Unicode CODE POINTS, not UTF-16 code units —
     * Python's len()/indexing is code-point based, and the advertised
     * bit-for-bit parity with the pandas fallback must hold for non-BMP
     * characters (emoji, rare CJK) too.
     */
    private static int[] cps(String s) {
        return s.codePoints().toArray();
    }

    public static double jaro(String s1, String s2) {
        if (s1.equals(s2)) {
            return 1.0;
        }
        int[] a = cps(s1);
        int[] b = cps(s2);
        int len1 = a.length;
        int len2 = b.length;
        if (len1 == 0 || len2 == 0) {
            return 0.0;
        }
        int matchWindow = Math.max(len1, len2) / 2 - 1;
        if (matchWindow < 0) {
            matchWindow = 0;
        }
        boolean[] flags1 = new boolean[len1];
        boolean[] flags2 = new boolean[len2];
        int matches = 0;
        for (int i = 0; i < len1; i++) {
            int ch = a[i];
            int lo = Math.max(0, i - matchWindow);
            int hi = Math.min(len2, i + matchWindow + 1);
            for (int j = lo; j < hi; j++) {
                if (!flags2[j] && b[j] == ch) {
                    flags1[i] = true;
                    flags2[j] = true;
                    matches++;
                    break;
                }
            }
        }
        if (matches == 0) {
            return 0.0;
        }
        int transpositions = 0;
        int j = 0;
        for (int i = 0; i < len1; i++) {
            if (flags1[i]) {
                while (!flags2[j]) {
                    j++;
                }
                if (a[i] != b[j]) {
                    transpositions++;
                }
                j++;
            }
        }
        // integer floor, NOT /2.0: an odd out-of-order count (possible when
        // the greedy window pairs different characters) floors in DuckDB /
        // rapidfuzz, and these kernels are pinned to DuckDB's values
        double t = transpositions / 2;
        double m = matches;
        return (m / len1 + m / len2 + (m - t) / m) / 3.0;
    }

    public static double jaroWinkler(String s1, String s2) {
        double jaro = jaro(s1, s2);
        // Winkler prefix bonus only above 0.7 (DuckDB / rapidfuzz default)
        if (jaro <= 0.7) {
            return jaro;
        }
        int[] a = cps(s1);
        int[] b = cps(s2);
        int prefix = 0;
        int bound = Math.min(4, Math.min(a.length, b.length));
        for (int i = 0; i < bound; i++) {
            if (a[i] == b[i]) {
                prefix++;
            } else {
                break;
            }
        }
        return jaro + prefix * 0.1 * (1.0 - jaro);
    }

    /** Character-set Jaccard similarity (DuckDB jaccard semantics). */
    public static double jaccardChars(String s1, String s2) {
        HashSet<Integer> a = new HashSet<>();
        HashSet<Integer> b = new HashSet<>();
        for (int cp : cps(s1)) {
            a.add(cp);
        }
        for (int cp : cps(s2)) {
            b.add(cp);
        }
        if (a.isEmpty() && b.isEmpty()) {
            return 1.0;
        }
        int inter = 0;
        for (Integer c : a) {
            if (b.contains(c)) {
                inter++;
            }
        }
        int union = a.size() + b.size() - inter;
        return union == 0 ? 0.0 : (double) inter / union;
    }

    /** Unrestricted Damerau-Levenshtein (adjacent transpositions). */
    public static int damerauLevenshtein(String s1, String s2) {
        if (s1.equals(s2)) {
            return 0;
        }
        int[] a = cps(s1);
        int[] b = cps(s2);
        int len1 = a.length;
        int len2 = b.length;
        if (len1 == 0) {
            return len2;
        }
        if (len2 == 0) {
            return len1;
        }
        int maxdist = len1 + len2;
        HashMap<Integer, Integer> da = new HashMap<>();
        int[][] d = new int[len1 + 2][len2 + 2];
        d[0][0] = maxdist;
        for (int i = 0; i <= len1; i++) {
            d[i + 1][0] = maxdist;
            d[i + 1][1] = i;
        }
        for (int j = 0; j <= len2; j++) {
            d[0][j + 1] = maxdist;
            d[1][j + 1] = j;
        }
        for (int i = 1; i <= len1; i++) {
            int db = 0;
            for (int j = 1; j <= len2; j++) {
                int k = da.getOrDefault(b[j - 1], 0);
                int l = db;
                int cost;
                if (a[i - 1] == b[j - 1]) {
                    cost = 0;
                    db = j;
                } else {
                    cost = 1;
                }
                d[i + 1][j + 1] = Math.min(
                    Math.min(d[i][j] + cost, d[i + 1][j] + 1),
                    Math.min(d[i][j + 1] + 1,
                             d[k][l] + (i - k - 1) + 1 + (j - l - 1)));
            }
            da.put(a[i - 1], i);
        }
        return d[len1 + 1][len2 + 1];
    }

    public static final class JaroSim implements UDF2<String, String, Double> {
        @Override
        public Double call(String a, String b) {
            return (a == null || b == null) ? null : jaro(a, b);
        }
    }

    public static final class JaroWinkler implements UDF2<String, String, Double> {
        @Override
        public Double call(String a, String b) {
            return (a == null || b == null) ? null : jaroWinkler(a, b);
        }
    }

    public static final class JaccardChars implements UDF2<String, String, Double> {
        @Override
        public Double call(String a, String b) {
            return (a == null || b == null) ? null : jaccardChars(a, b);
        }
    }

    public static final class DamerauLevenshtein implements UDF2<String, String, Double> {
        @Override
        public Double call(String a, String b) {
            return (a == null || b == null) ? null : (double) damerauLevenshtein(a, b);
        }
    }
}
