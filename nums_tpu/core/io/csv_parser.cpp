// Fast delimiter-separated numeric text parser.
//
// Role: the compute-heavy inner loop of parallel CSV/loadtxt ingestion
// (reference analogue: the per-worker ``read_csv_block`` kernel,
// nums/core/systems/filesystem.py:157-212, whose speed the reference
// inherits from Ray's C++ workers). Python drives byte-range splitting;
// each range is parsed here with the GIL released (ctypes), so ranges
// parse on real OS threads in parallel.
//
// Build: cc -O3 -shared -fPIC csv_parser.cpp -o libnums_csv.so
// (done lazily by nums_tpu/core/io/_native.py and cached).

#include <cstdlib>
#include <cstring>
#include <cstdint>

extern "C" {

// Parse `len` bytes of text: rows separated by '\n', fields by `delim`.
// Writes up to max_vals doubles to out. Returns number of values parsed,
// or -1 if out capacity was exceeded, -2 on a malformed field, -3 when a
// row's width differs from the first row's (ragged input — numpy's
// loadtxt raises on this, so the caller must not accept it silently).
// *n_rows/*n_cols receive the parsed row count and row width.
long nums_parse_csv(const char* buf, long len, char delim, double* out,
                    long max_vals, long* n_rows, long* n_cols) {
    long count = 0;
    long rows = 0;
    long cols = -1;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
        // Skip blank lines / trailing newline runs.
        while (p < end && (*p == '\n' || *p == '\r')) p++;
        if (p >= end) break;
        long row_cols = 0;
        while (p < end && *p != '\n') {
            char* next = nullptr;
            double v = strtod(p, &next);
            if (next == p) {
                // Not a number (e.g. stray text): fail parse.
                return -2;
            }
            if (count >= max_vals) return -1;
            out[count++] = v;
            row_cols++;
            p = next;
            // Skip delimiter / spaces / CR before next field or newline.
            while (p < end && (*p == delim || *p == ' ' || *p == '\t' ||
                               *p == '\r'))
                p++;
        }
        if (cols < 0) cols = row_cols;
        else if (row_cols != cols) return -3;
        rows++;
        if (p < end) p++;  // consume '\n'
    }
    *n_rows = rows;
    *n_cols = cols < 0 ? 0 : cols;
    return count;
}

}  // extern "C"
