// Native IO runtime for ginkgo_tpu: fast MatrixMarket parser + raw binary
// matrix format.
//
// TPU-native counterpart of the reference's C++ host IO layer
// (core/base/mtx_io.cpp: read_raw, read_binary_raw, write_binary).  The
// compute path is JAX/Pallas; host-side data loading stays native C++ for
// the same reason the reference's is: parsing multi-GB SuiteSparse .mtx
// files in the driver language is orders of magnitude too slow.
//
// Exposed as a plain C ABI consumed via ctypes (ginkgo_tpu/io/native.py).
// All output buffers are malloc'd here and released with gko_free_result.

#include <cctype>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <algorithm>
#include <numeric>

extern "C" {

struct GkoParseResult {
    int64_t nrows;
    int64_t ncols;
    int64_t nnz;        // entries after symmetry expansion
    int32_t is_complex; // values buffer holds 2*nnz doubles (re,im) if set
    int64_t* rows;      // [nnz]
    int64_t* cols;      // [nnz]
    double* values;     // [nnz] or [2*nnz]
    char error[256];
};

} // extern "C"

namespace {

// -- low-level scanning -------------------------------------------------------

inline const char* skip_ws(const char* p, const char* end)
{
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* parse_i64(const char* p, const char* end, int64_t* out)
{
    p = skip_ws(p, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
    *out = neg ? -v : v;
    return p;
}

inline const char* parse_f64(const char* p, const char* end, double* out)
{
    p = skip_ws(p, end);
    char* q = nullptr;
    *out = strtod(p, &q);
    return q ? q : p;
}

inline const char* next_line(const char* p, const char* end)
{
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

bool read_file(const char* path, std::vector<char>& buf, char* err)
{
    FILE* f = fopen(path, "rb");
    if (!f) { snprintf(err, 256, "cannot open %s", path); return false; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    buf.resize(static_cast<size_t>(sz));
    size_t got = sz ? fread(buf.data(), 1, static_cast<size_t>(sz), f) : 0;
    fclose(f);
    if (got != static_cast<size_t>(sz)) {
        snprintf(err, 256, "short read on %s", path);
        return false;
    }
    return true;
}

enum class Field { real, integer, pattern, cpx };
enum class Sym { general, symmetric, skew, hermitian };

struct Entry {
    int64_t r, c;
    double re, im;
};

void sort_row_major(std::vector<Entry>& es)
{
    std::sort(es.begin(), es.end(), [](const Entry& a, const Entry& b) {
        return a.r != b.r ? a.r < b.r : a.c < b.c;
    });
}

// Returns 0 on success, 1 on allocation failure (error already set).
int fill_result(GkoParseResult* res, int64_t nrows, int64_t ncols,
                std::vector<Entry>& es, bool is_cpx)
{
    sort_row_major(es);
    const int64_t nnz = static_cast<int64_t>(es.size());
    res->nrows = nrows;
    res->ncols = ncols;
    res->nnz = nnz;
    res->is_complex = is_cpx ? 1 : 0;
    res->rows = static_cast<int64_t*>(malloc(sizeof(int64_t) * nnz));
    res->cols = static_cast<int64_t*>(malloc(sizeof(int64_t) * nnz));
    res->values =
        static_cast<double*>(malloc(sizeof(double) * nnz * (is_cpx ? 2 : 1)));
    if (nnz > 0 && (!res->rows || !res->cols || !res->values)) {
        snprintf(res->error, 256, "allocation failed for %lld entries",
                 static_cast<long long>(nnz));
        free(res->rows);
        free(res->cols);
        free(res->values);
        res->rows = nullptr;
        res->cols = nullptr;
        res->values = nullptr;
        res->nnz = 0;
        return 1;
    }
    for (int64_t i = 0; i < nnz; ++i) {
        res->rows[i] = es[i].r;
        res->cols[i] = es[i].c;
        if (is_cpx) {
            res->values[2 * i] = es[i].re;
            res->values[2 * i + 1] = es[i].im;
        } else {
            res->values[i] = es[i].re;
        }
    }
    return 0;
}

} // namespace

extern "C" {

void gko_free_result(GkoParseResult* res);

// Parse a MatrixMarket file.  Returns 0 on success.
int gko_read_mtx(const char* path, GkoParseResult* res)
{
    memset(res, 0, sizeof(*res));
    std::vector<char> buf;
    if (!read_file(path, buf, res->error)) return 1;
    const char* p = buf.data();
    const char* end = p + buf.size();

    // banner: %%MatrixMarket matrix <layout> <field> <symmetry>
    if (buf.size() < 14 || strncmp(p, "%%MatrixMarket", 14) != 0) {
        snprintf(res->error, 256, "missing MatrixMarket banner");
        return 1;
    }
    char object[32] = {0}, layout[32] = {0}, field_s[32] = {0}, sym_s[32] = {0};
    {
        const char* line_end = p;
        while (line_end < end && *line_end != '\n') ++line_end;
        std::string banner(p, line_end);
        for (auto& ch : banner) ch = static_cast<char>(tolower(ch));
        if (sscanf(banner.c_str(), "%%%%matrixmarket %31s %31s %31s %31s",
                   object, layout, field_s, sym_s) != 4 ||
            strcmp(object, "matrix") != 0) {
            snprintf(res->error, 256, "bad banner");
            return 1;
        }
    }
    Field field;
    if (!strcmp(field_s, "real") || !strcmp(field_s, "double")) field = Field::real;
    else if (!strcmp(field_s, "integer")) field = Field::integer;
    else if (!strcmp(field_s, "pattern")) field = Field::pattern;
    else if (!strcmp(field_s, "complex")) field = Field::cpx;
    else { snprintf(res->error, 256, "unknown field %s", field_s); return 1; }
    Sym sym;
    if (!strcmp(sym_s, "general")) sym = Sym::general;
    else if (!strcmp(sym_s, "symmetric")) sym = Sym::symmetric;
    else if (!strcmp(sym_s, "skew-symmetric")) sym = Sym::skew;
    else if (!strcmp(sym_s, "hermitian")) sym = Sym::hermitian;
    else { snprintf(res->error, 256, "unknown symmetry %s", sym_s); return 1; }

    p = next_line(p, end);
    // skip comments / blank lines
    while (p < end) {
        const char* q = skip_ws(p, end);
        if (q < end && (*q == '%' || *q == '\n')) { p = next_line(p, end); continue; }
        break;
    }

    const bool is_cpx = (field == Field::cpx);
    std::vector<Entry> es;

    if (!strcmp(layout, "coordinate")) {
        int64_t nrows = 0, ncols = 0, nnz = 0;
        p = parse_i64(p, end, &nrows);
        p = parse_i64(p, end, &ncols);
        p = parse_i64(p, end, &nnz);
        p = next_line(p, end);
        es.reserve(static_cast<size_t>(sym == Sym::general ? nnz : 2 * nnz));
        for (int64_t i = 0; i < nnz; ++i) {
            while (p < end) {  // tolerate blank/comment lines inside body
                const char* q = skip_ws(p, end);
                if (q < end && (*q == '%' || *q == '\n')) { p = next_line(p, end); continue; }
                break;
            }
            if (p >= end) { snprintf(res->error, 256, "truncated body"); return 1; }
            Entry e{0, 0, 1.0, 0.0};
            p = parse_i64(p, end, &e.r);
            p = parse_i64(p, end, &e.c);
            --e.r; --e.c;
            // MatrixMarket is 1-based: a 0 (or out-of-range) index would
            // wrap through numpy fancy indexing downstream — reject here.
            if (e.r < 0 || e.r >= nrows || e.c < 0 || e.c >= ncols) {
                snprintf(res->error, 256,
                         "entry %lld: coordinate (%lld, %lld) outside "
                         "1-based [1, %lld] x [1, %lld]",
                         static_cast<long long>(i),
                         static_cast<long long>(e.r + 1),
                         static_cast<long long>(e.c + 1),
                         static_cast<long long>(nrows),
                         static_cast<long long>(ncols));
                return 1;
            }
            if (field == Field::real || field == Field::integer) {
                p = parse_f64(p, end, &e.re);
            } else if (field == Field::cpx) {
                p = parse_f64(p, end, &e.re);
                p = parse_f64(p, end, &e.im);
            }
            p = next_line(p, end);
            es.push_back(e);
            if (sym != Sym::general && e.r != e.c) {
                Entry t{e.c, e.r, e.re, e.im};
                if (sym == Sym::skew) { t.re = -t.re; t.im = -t.im; }
                if (sym == Sym::hermitian) { t.im = -t.im; }
                es.push_back(t);
            }
        }
        if (fill_result(res, nrows, ncols, es, is_cpx)) return 1;
    } else if (!strcmp(layout, "array")) {
        int64_t nrows = 0, ncols = 0;
        p = parse_i64(p, end, &nrows);
        p = parse_i64(p, end, &ncols);
        p = next_line(p, end);
        auto read_val = [&](double* re, double* im) {
            while (p < end) {
                const char* q = skip_ws(p, end);
                if (q < end && (*q == '%' || *q == '\n')) { p = next_line(p, end); continue; }
                break;
            }
            p = parse_f64(p, end, re);
            if (is_cpx) p = parse_f64(p, end, im);
            p = next_line(p, end);
        };
        if (sym == Sym::general) {
            for (int64_t j = 0; j < ncols; ++j)
                for (int64_t i = 0; i < nrows; ++i) {
                    Entry e{i, j, 0.0, 0.0};
                    read_val(&e.re, &e.im);
                    if (e.re != 0.0 || e.im != 0.0) es.push_back(e);
                }
        } else {
            // lower triangle column-wise, then mirror
            for (int64_t j = 0; j < ncols; ++j)
                for (int64_t i = j; i < nrows; ++i) {
                    Entry e{i, j, 0.0, 0.0};
                    read_val(&e.re, &e.im);
                    if (e.re == 0.0 && e.im == 0.0) continue;
                    es.push_back(e);
                    if (i != j) {
                        Entry t{j, i, e.re, e.im};
                        if (sym == Sym::skew) { t.re = -t.re; t.im = -t.im; }
                        if (sym == Sym::hermitian) { t.im = -t.im; }
                        es.push_back(t);
                    }
                }
        }
        if (fill_result(res, nrows, ncols, es, is_cpx)) return 1;
    } else {
        snprintf(res->error, 256, "unknown layout %s", layout);
        return 1;
    }
    return 0;
}

// -- raw binary format (GTB1) -------------------------------------------------
// header: magic "GTB1" | u32 flags (bit0 = complex) | i64 nrows ncols nnz
// body:   rows int64[nnz] | cols int64[nnz] | values f64[nnz or 2*nnz]
// Counterpart of the reference's binary format (mtx_io.hpp:96,
// benchmark/tools/mtx_to_binary.cpp), redesigned as a flat mmap-able layout.

int gko_write_binary(const char* path, int64_t nrows, int64_t ncols,
                     int64_t nnz, int32_t is_complex, const int64_t* rows,
                     const int64_t* cols, const double* values)
{
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    uint32_t flags = is_complex ? 1u : 0u;
    int64_t hdr[3] = {nrows, ncols, nnz};
    int ok = fwrite("GTB1", 1, 4, f) == 4 &&
             fwrite(&flags, 4, 1, f) == 1 &&
             fwrite(hdr, sizeof(hdr), 1, f) == 1 &&
             (nnz == 0 || (fwrite(rows, 8, nnz, f) == (size_t)nnz &&
                           fwrite(cols, 8, nnz, f) == (size_t)nnz &&
                           fwrite(values, 8, nnz * (is_complex ? 2 : 1), f) ==
                               (size_t)(nnz * (is_complex ? 2 : 1))));
    fclose(f);
    return ok ? 0 : 1;
}

int gko_read_binary(const char* path, GkoParseResult* res)
{
    memset(res, 0, sizeof(*res));
    FILE* f = fopen(path, "rb");
    if (!f) { snprintf(res->error, 256, "cannot open %s", path); return 1; }
    char magic[4];
    uint32_t flags = 0;
    int64_t hdr[3] = {0, 0, 0};
    if (fread(magic, 1, 4, f) != 4 || strncmp(magic, "GTB1", 4) != 0 ||
        fread(&flags, 4, 1, f) != 1 || fread(hdr, sizeof(hdr), 1, f) != 1) {
        snprintf(res->error, 256, "bad GTB1 header");
        fclose(f);
        return 1;
    }
    res->nrows = hdr[0];
    res->ncols = hdr[1];
    res->nnz = hdr[2];
    res->is_complex = (flags & 1) ? 1 : 0;
    const int64_t nnz = res->nnz;
    const int64_t nv = nnz * (res->is_complex ? 2 : 1);
    // Validate the untrusted header before allocating: negative or
    // implausible nnz (body larger than the remaining file) must error,
    // not crash through a null/short malloc.
    long body_start = ftell(f);
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, body_start, SEEK_SET);
    const int64_t body_bytes_avail = (int64_t)fsize - (int64_t)body_start;
    if (nnz < 0 || hdr[0] < 0 || hdr[1] < 0 ||
        nnz > body_bytes_avail / 8 / (res->is_complex ? 4 : 3) + 1) {
        snprintf(res->error, 256,
                 "GTB1 header claims %lld entries but only %lld body bytes "
                 "follow", (long long)nnz, (long long)body_bytes_avail);
        fclose(f);
        res->nnz = 0;
        return 1;
    }
    res->rows = static_cast<int64_t*>(malloc(8 * nnz));
    res->cols = static_cast<int64_t*>(malloc(8 * nnz));
    res->values = static_cast<double*>(malloc(8 * nv));
    if (nnz > 0 && (!res->rows || !res->cols || !res->values)) {
        snprintf(res->error, 256, "allocation failed for %lld entries",
                 (long long)nnz);
        fclose(f);
        gko_free_result(res);
        res->nnz = 0;
        return 1;
    }
    int ok = nnz == 0 || (fread(res->rows, 8, nnz, f) == (size_t)nnz &&
                          fread(res->cols, 8, nnz, f) == (size_t)nnz &&
                          fread(res->values, 8, nv, f) == (size_t)nv);
    fclose(f);
    if (!ok) snprintf(res->error, 256, "truncated GTB1 body");
    return ok ? 0 : 1;
}

void gko_free_result(GkoParseResult* res)
{
    free(res->rows);
    free(res->cols);
    free(res->values);
    res->rows = nullptr;
    res->cols = nullptr;
    res->values = nullptr;
}

} // extern "C"
