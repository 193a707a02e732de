/* fastload.c — native data-plane helpers for the training input pipeline.
 *
 * The on-disk corpus stores codec tokens as text lines of space-separated
 * integers (SURVEY.md §1 data contract; reference combined_dataset.py:258-262
 * parses them with Python str.split + int()). At Emilia scale that parse is
 * the dataloader hot loop, so it lives here as C:
 *
 *   parse_ints     : text buffer -> int32 array (returns count)
 *   parse_file     : path -> int32 array (first line only, like the
 *                    reference's single-codebook read)
 *   pad_pack       : ragged int32 rows -> fixed [B, T] padded matrix
 *
 * Built as a plain shared object (no pybind11); Python binds via ctypes with
 * a pure-Python fallback (fastload.py).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

long parse_ints(const char *buf, long len, int32_t *out, long max_out) {
    long n = 0;
    long i = 0;
    while (i < len && n < max_out) {
        /* skip separators */
        while (i < len && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r'))
            i++;
        if (i >= len || buf[i] == '\n')
            break;
        int neg = 0;
        if (buf[i] == '-') { neg = 1; i++; }
        long v = 0;
        int digits = 0;
        while (i < len && buf[i] >= '0' && buf[i] <= '9') {
            v = v * 10 + (buf[i] - '0');
            i++;
            digits++;
        }
        if (!digits)
            return -1; /* malformed */
        out[n++] = (int32_t)(neg ? -v : v);
    }
    return n;
}

long parse_file(const char *path, int32_t *out, long max_out) {
    FILE *f = fopen(path, "rb");
    if (!f)
        return -1;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
    long size = ftell(f);
    if (size < 0) { fclose(f); return -1; }
    rewind(f);
    char *buf = (char *)malloc((size_t)size);
    if (!buf) { fclose(f); return -1; }
    long got = (long)fread(buf, 1, (size_t)size, f);
    fclose(f);
    if (got != size) { free(buf); return -1; }
    /* first line only (single codebook) */
    char *nl = memchr(buf, '\n', (size_t)size);
    long line_len = nl ? (long)(nl - buf) : size;
    long n = parse_ints(buf, line_len, out, max_out);
    free(buf);
    return n;
}

/* rows: concatenated int32 values; offsets: [b+1] prefix offsets.
 * Writes a [b, t] matrix filled with pad_value. */
void pad_pack(const int32_t *rows, const long *offsets, long b, long t,
              int32_t pad_value, int32_t *out) {
    for (long i = 0; i < b; i++) {
        long start = offsets[i];
        long n = offsets[i + 1] - start;
        if (n > t)
            n = t;
        int32_t *dst = out + i * t;
        memcpy(dst, rows + start, (size_t)n * sizeof(int32_t));
        for (long j = n; j < t; j++)
            dst[j] = pad_value;
    }
}
