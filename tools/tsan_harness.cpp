// TSAN pass over the native library's concurrency (VERDICT r4 item 7).
//
// Build (whole binary instrumented, library source compiled in):
//   g++ -std=c++17 -O1 -g -fsanitize=thread -pthread \
//       tools/tsan_harness.cpp -o /tmp/tsan_harness \
//       -DREPAQ_NATIVE_SRC='"repaq_tpu/native/repaq_native.cpp"'
//   REPAQ_LZ_THREADS=4 /tmp/tsan_harness
//
// Exercises the real concurrency shapes:
//   1. lz_parse with REPAQ_LZ_THREADS=4 (internal window std::threads +
//      the magic-static knob init).
//   2. 4 "worker" threads running the per-chunk encode/decode entry
//      points concurrently on disjoint buffers — the shape the Python
//      --workers pool creates (shared: lazily-initialized tables).
//   3. Two concurrent lz_parse calls (the --num_shards shape), each
//      spawning its own window threads.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#ifndef REPAQ_NATIVE_SRC
#define REPAQ_NATIVE_SRC "../repaq_tpu/native/repaq_native.cpp"
#endif
#include REPAQ_NATIVE_SRC

static std::vector<uint8_t> make_coverage(int64_t n, uint64_t seed) {
    // reads drawn from a small shared genome => real LZ matches
    std::mt19937_64 rng(seed);
    std::vector<uint8_t> genome(200000);
    const char* B = "ACGT";
    for (auto& g : genome) g = (uint8_t)B[rng() & 3];
    std::vector<uint8_t> out;
    out.reserve(n);
    while ((int64_t)out.size() < n) {
        int64_t p = (int64_t)(rng() % (genome.size() - 160));
        for (int i = 0; i < 150 && (int64_t)out.size() < n; i++) {
            uint8_t c = genome[p + i];
            if ((rng() & 1023) == 0) c = (uint8_t)B[rng() & 3];
            out.push_back(c);
        }
    }
    return out;
}

static void worker_body(int tid, std::atomic<int>* fail) {
    std::mt19937_64 rng(77 + tid);
    const int64_t n = 1 << 20;
    // buffer contracts from codec/_native.py qualcol_encode: out 5n+...,
    // scratch 9n+... (posbuf + segment area + escapes)
    std::vector<uint8_t> qual(n), seq(n), out(5 * n + 4 * 3 + 1024),
        scratch(9 * n + 8 * 3 + 2048);
    const uint8_t binv[3] = {'#', ',', ':'};
    uint8_t bin_of[256];
    memset(bin_of, 0xFF, 256);
    bin_of['#'] = 0; bin_of[','] = 1; bin_of[':'] = 2;
    bin_of['F'] = 0xFE;  // the major marker (wrapper contract)
    const char* B = "ACGT";
    for (int64_t i = 0; i < n; i++) {
        uint64_t r = rng();
        qual[i] = (r & 7) ? 'F' : binv[r % 3];
        seq[i] = ((r >> 8) & 511) ? (uint8_t)B[(r >> 3) & 3] : 'N';
    }
    for (int rep = 0; rep < 3; rep++) {
        int64_t ql = qualcol_encode_sp(qual.data(), n, binv, 3, bin_of,
                                       out.data(), scratch.data());
        std::vector<uint8_t> back(n, (uint8_t)'F');  // decode prefills major
        qualcol_decode(out.data(), ql, binv, 3, back.data(), n);
        for (int64_t i = 0; i < n; i++) {
            uint8_t want = qual[i] == 'F' ? 'F' : qual[i];
            if (back[i] != want) { fail->store(1); return; }
        }
        // positions stream roundtrip
        std::vector<uint8_t> mask(n);
        int64_t pl = positions_encode(seq.data(), n, 'N', out.data(),
                                      mask.data());
        std::vector<int64_t> pos(n + 4);
        positions_decode(out.data(), pl, pos.data());
        // coords
        std::vector<int64_t> vals(5000);
        for (auto& v : vals) v = (int64_t)(rng() % 40000);
        int64_t cl = coords_encode(vals.data(), (int64_t)vals.size(),
                                   out.data());
        std::vector<int64_t> vback(vals.size() + 4);
        coords_decode(out.data(), cl, vback.data(), (int64_t)vals.size());
        for (size_t i = 0; i < vals.size(); i++)
            if (vback[i] != vals[i]) { fail->store(1); return; }
        // pack/unpack (the shared lazily-built tables)
        std::vector<uint8_t> packed((n + 3) / 4), unp(n + 8);
        pack_2bit(seq.data(), n, packed.data());
        unpack_2bit(packed.data(), (int64_t)packed.size(), unp.data(), n);
        // quality_scan (shared ok[] table)
        int64_t hs[256], hq[256], meta[4];
        quality_scan(seq.data(), qual.data(), n, hs, hq, meta);
    }
}

int main() {
    std::atomic<int> fail{0};

    fprintf(stderr, "[tsan] 1: lz_parse with internal window threads\n");
    {
        auto data = make_coverage(48 << 20, 1);  // 6 windows
        int64_t cap = (int64_t)data.size() / 4 + 1024;
        std::vector<int64_t> ll(cap), ml(cap), dd(cap);
        int64_t ntok = lz_parse(data.data(), (int64_t)data.size(), 16,
                                ll.data(), ml.data(), dd.data(), cap, 0);
        fprintf(stderr, "[tsan]    ntok=%lld\n", (long long)ntok);
        if (ntok <= 0) fail.store(1);
    }

    fprintf(stderr, "[tsan] 2: 4 concurrent worker threads, codec entry "
                    "points\n");
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < 4; t++)
            ts.emplace_back(worker_body, t, &fail);
        for (auto& th : ts) th.join();
    }

    fprintf(stderr, "[tsan] 3: two concurrent lz_parse calls (shard "
                    "shape), each multi-window\n");
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < 2; t++) {
            ts.emplace_back([t, &fail] {
                auto data = make_coverage(24 << 20, 100 + t);
                int64_t cap = (int64_t)data.size() / 4 + 1024;
                std::vector<int64_t> ll(cap), ml(cap), dd(cap);
                int64_t ntok = lz_parse(data.data(), (int64_t)data.size(),
                                        16, ll.data(), ml.data(), dd.data(),
                                        cap, 0);
                if (ntok <= 0) fail.store(1);
                // expand back and verify
                std::vector<uint8_t> lits(data.size());
                int64_t lp = 0, o = 0;
                for (int64_t i = 0; i < ntok; i++) {
                    memcpy(lits.data() + lp, data.data() + o, (size_t)ll[i]);
                    lp += ll[i];
                    o += ll[i] + ml[i];
                }
                std::vector<uint8_t> back(data.size());
                int64_t got = lz_expand(ll.data(), ml.data(), dd.data(),
                                        ntok, lits.data(), lp, back.data(),
                                        (int64_t)back.size(), 0);
                if (got != (int64_t)data.size() ||
                    memcmp(back.data(), data.data(), data.size()) != 0)
                    fail.store(1);
            });
        }
        for (auto& th : ts) th.join();
    }

    if (fail.load()) {
        fprintf(stderr, "[tsan] FUNCTIONAL FAILURE\n");
        return 2;
    }
    fprintf(stderr, "[tsan] done (functional checks passed; TSAN verdict "
                    "is the process exit status)\n");
    return 0;
}
