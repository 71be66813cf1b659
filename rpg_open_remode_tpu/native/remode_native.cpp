// Native IO runtime for rpg_open_remode_tpu.
//
// The reference implements its host runtime in C++ (test/dataset.cpp,
// src/publisher.cpp); the equivalents here cover the IO paths that are
// genuinely hot on the host side of the TPU pipeline and slow in Python:
//
//   - ASCII ground-truth depthmap parsing (test/dataset.cpp:159-186 —
//     W*H whitespace-separated floats, centimetres on disk / 100 -> metres):
//     a 640x480 file is ~2.5 MB of text per frame; strtof-loop parsing is
//     ~20x faster than Python float() splitting.
//   - Binary little-endian PLY point-cloud writing (the file-export analog
//     of src/publisher.cpp:54-104): one fwrite of an interleaved buffer.
//   - PGM (P5) grayscale image decoding: the no-dependency on-ramp for raw
//     camera dumps.
//
// Built as a plain shared library (g++ -O3 -shared -fPIC), loaded with
// ctypes; every entry point has a pure-Python fallback in
// rpg_open_remode_tpu/native/__init__.py.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>

extern "C" {

// Parse `count` whitespace-separated floats from the file, scaling by
// `scale` (the dataset stores centimetres; pass 0.01f to get metres —
// matching the /100 in test/dataset.cpp:180). Returns the number parsed.
long rmd_parse_float_file(const char *path, float *out, long count, float scale)
{
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char *buf = (char *)std::malloc(size + 1);
    if (!buf) { std::fclose(f); return -1; }
    long got = (long)std::fread(buf, 1, size, f);
    std::fclose(f);
    buf[got] = '\0';

    long n = 0;
    char *p = buf;
    char *end = buf + got;
    while (n < count && p < end) {
        char *next = nullptr;
        float v = std::strtof(p, &next);
        if (next == p) { ++p; continue; }  // skip non-numeric byte
        out[n++] = v * scale;
        p = next;
    }
    std::free(buf);
    return n;
}

// Write a binary little-endian PLY of n points with intensity
// (x y z intensity as float32). Returns 0 on success.
int rmd_write_ply(const char *path, const float *xyz, const float *intensity,
                  long n)
{
    FILE *f = std::fopen(path, "wb");
    if (!f) return -1;
    std::fprintf(f,
                 "ply\nformat binary_little_endian 1.0\n"
                 "element vertex %ld\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property float intensity\nend_header\n",
                 n);
    // interleave in chunks to keep one fwrite stream
    const long CHUNK = 1 << 14;
    float *tmp = (float *)std::malloc(sizeof(float) * 4 * CHUNK);
    if (!tmp) { std::fclose(f); return -1; }
    for (long i = 0; i < n; i += CHUNK) {
        long m = (n - i < CHUNK) ? (n - i) : CHUNK;
        for (long j = 0; j < m; ++j) {
            tmp[4 * j + 0] = xyz[3 * (i + j) + 0];
            tmp[4 * j + 1] = xyz[3 * (i + j) + 1];
            tmp[4 * j + 2] = xyz[3 * (i + j) + 2];
            tmp[4 * j + 3] = intensity[i + j];
        }
        if (std::fwrite(tmp, sizeof(float) * 4, m, f) != (size_t)m) {
            std::free(tmp);
            std::fclose(f);
            return -1;
        }
    }
    std::free(tmp);
    std::fclose(f);
    return 0;
}

// Decode a binary 8-bit PGM (P5). Returns 0 on success and fills
// width/height; `out` must hold max_bytes. If out == nullptr, only the
// header is parsed (size query).
int rmd_read_pgm(const char *path, uint8_t *out, long max_bytes,
                 int *width, int *height)
{
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    char magic[3] = {0};
    if (std::fscanf(f, "%2s", magic) != 1 || std::strcmp(magic, "P5") != 0) {
        std::fclose(f);
        return -2;
    }
    int vals[3], got = 0;
    while (got < 3) {
        int c = std::fgetc(f);
        if (c == EOF) { std::fclose(f); return -3; }
        if (c == '#') {  // comment line
            while (c != '\n' && c != EOF) c = std::fgetc(f);
            continue;
        }
        if (c >= '0' && c <= '9') {
            std::ungetc(c, f);
            if (std::fscanf(f, "%d", &vals[got]) != 1) { std::fclose(f); return -3; }
            ++got;
        }
    }
    std::fgetc(f);  // single whitespace after maxval
    *width = vals[0];
    *height = vals[1];
    long need = (long)vals[0] * vals[1];
    if (!out) { std::fclose(f); return 0; }
    if (need > max_bytes) { std::fclose(f); return -4; }
    long rd = (long)std::fread(out, 1, need, f);
    std::fclose(f);
    return rd == need ? 0 : -5;
}

}  // extern "C"
