// Fast parser for Brox-style multicut trajectory files (FBMS "tracks"):
//
//   line 0: header (sequence length)
//   line 1: number of trajectories
//   then per trajectory:  "object_id length"
//                         length x  "x y frame_id"
//
// The reference parses these files line-by-line in Python
// (`awesome/dataset/fbms_sequence_dataset.py:736-789`), which takes
// seconds-to-minutes for the ~100k-trajectory FBMS track files and is
// re-run per sequence; this native parser is the framework's data-loader
// hot path (tens of MB/s single-threaded).
//
// Two-pass C API (ctypes-friendly):
//   traj_count(path, &n_traj, &n_points)         -> sizes
//   traj_parse(path, object_ids[n_traj], lengths[n_traj],
//              coords[n_points*2], frame_ids[n_points]) -> 0 on success
//
// Build: make -C native (libtrajparse.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct FileBuf {
    std::vector<char> data;
    bool ok = false;
};

FileBuf read_file(const char* path) {
    FileBuf fb;
    FILE* f = std::fopen(path, "rb");
    if (!f) return fb;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    fb.data.resize(static_cast<size_t>(size) + 1);
    size_t rd = std::fread(fb.data.data(), 1, static_cast<size_t>(size), f);
    std::fclose(f);
    fb.data[rd] = '\0';
    fb.ok = true;
    return fb;
}

// Skip to the start of the next line.
inline const char* next_line(const char* p) {
    while (*p && *p != '\n') p++;
    if (*p == '\n') p++;
    return p;
}

inline const char* skip_ws(const char* p) {
    while (*p == ' ' || *p == '\t' || *p == '\r') p++;
    return p;
}

inline long parse_long(const char** pp) {
    char* end;
    long v = std::strtol(*pp, &end, 10);
    *pp = end;
    return v;
}

inline double parse_double(const char** pp) {
    char* end;
    double v = std::strtod(*pp, &end);
    *pp = end;
    return v;
}

}  // namespace

extern "C" {

int traj_count(const char* path, long* n_traj, long* n_points) {
    FileBuf fb = read_file(path);
    if (!fb.ok) return -1;
    const char* p = fb.data.data();
    p = next_line(p);  // header
    p = skip_ws(p);
    long declared = parse_long(&p);
    p = next_line(p);
    long nt = 0, np = 0;
    while (*p) {
        p = skip_ws(p);
        if (!*p) break;
        parse_long(&p);  // object id
        p = skip_ws(p);
        long len = parse_long(&p);
        p = next_line(p);
        for (long i = 0; i < len && *p; i++) p = next_line(p);
        nt++;
        np += len;
    }
    if (declared > 0 && nt != declared) {
        // tolerate but signal mismatch via negative count convention
        *n_traj = nt;
        *n_points = np;
        return 1;
    }
    *n_traj = nt;
    *n_points = np;
    return 0;
}

int traj_parse(const char* path, long* object_ids, long* lengths,
               double* coords, long* frame_ids) {
    FileBuf fb = read_file(path);
    if (!fb.ok) return -1;
    const char* p = fb.data.data();
    p = next_line(p);  // header
    p = next_line(p);  // count
    long ti = 0, pi = 0;
    while (*p) {
        p = skip_ws(p);
        if (!*p) break;
        long oid = parse_long(&p);
        p = skip_ws(p);
        long len = parse_long(&p);
        p = next_line(p);
        object_ids[ti] = oid;
        lengths[ti] = len;
        for (long i = 0; i < len; i++) {
            p = skip_ws(p);
            coords[pi * 2 + 0] = parse_double(&p);
            p = skip_ws(p);
            coords[pi * 2 + 1] = parse_double(&p);
            p = skip_ws(p);
            frame_ids[pi] = parse_long(&p);
            p = next_line(p);
            pi++;
        }
        ti++;
    }
    return 0;
}

}  // extern "C"
