// bgpt_reader — standalone ggml-model.bin reader harness (interop proof).
//
// An independent C++ re-implementation of the REFERENCE loader's parsing
// contract (/root/reference/biogpt.cpp:27-453: magic check, 7 int32
// hparams, length-prefixed vocab with [_extra_token_N] shortfall padding,
// length-prefixed merges, then tensor records {n_dims, name_len, ttype,
// dims[n_dims] reversed, name, raw data} until EOF, with the reference's
// shape/size validation). The reference binary itself cannot be built in
// this environment (its ggml submodule is absent from the mount), so this
// harness stands in for it: if a file written by the Python layer parses
// here — sharing no code with modelio/ggml_format.py — and every field and
// tensor byte hashes identically from both sides, the on-disk contract is
// cross-checked, not merely self-consistent.
//
// Output: a canonical text dump (one line per section/tensor with FNV-1a
// hashes) that tests/test_native.py compares against the Python reader's
// dump of the same file.
//
// Usage: bgpt_reader <ggml-model.bin>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x67676d6c;  // 'ggml', biogpt.h:13

uint64_t fnv1a(const uint8_t* p, size_t n, uint64_t h = 1469598103934665603ull) {
    for (size_t i = 0; i < n; i++) {
        h ^= p[i];
        h *= 1099511628211ull;
    }
    return h;
}

// ggml type codes used by the file format (biogpt.cpp:542,551)
const char* type_name(int32_t t) {
    switch (t) {
        case 0: return "f32";
        case 1: return "f16";
        case 2: return "q4_0";
        case 3: return "q4_1";
        case 6: return "q5_0";
        case 7: return "q5_1";
        case 8: return "q8_0";
        default: return nullptr;
    }
}

// bytes per block of 32 elements (SURVEY §2.7); f32/f16 handled separately
int64_t block_bytes(int32_t t) {
    switch (t) {
        case 2: return 18;
        case 3: return 20;
        case 6: return 22;
        case 7: return 24;
        case 8: return 34;
        default: return -1;
    }
}

int64_t tensor_nbytes(int32_t t, int64_t nelements, int64_t row_len) {
    if (t == 0) return nelements * 4;
    if (t == 1) return nelements * 2;
    const int64_t bb = block_bytes(t);
    if (bb < 0 || row_len % 32 != 0) return -1;   // blocks never straddle rows
    return nelements / 32 * bb;
}

bool read_i32(FILE* f, int32_t* v) { return std::fread(v, 4, 1, f) == 1; }

bool read_str(FILE* f, std::string* s) {
    int32_t len;
    if (!read_i32(f, &len) || len < 0 || len > (1 << 20)) return false;
    s->resize(len);
    return len == 0 || std::fread(&(*s)[0], 1, len, f) == (size_t)len;
}

int fail(const char* what) {
    std::fprintf(stderr, "bgpt_reader: %s\n", what);
    return 1;
}

}  // namespace

int main(int argc, char** argv) {
    if (argc != 2) return fail("usage: bgpt_reader <ggml-model.bin>");
    FILE* f = std::fopen(argv[1], "rb");
    if (!f) return fail("cannot open file");

    uint32_t magic;
    if (std::fread(&magic, 4, 1, f) != 1 || magic != kMagic)
        return fail("bad magic (expected 'ggml')");

    // 7 int32 hparams, order fixed by convert.py:91-97 / biogpt.cpp:54-60
    int32_t n_vocab, n_layer, n_head, n_positions, d_ff, d_model, ftype;
    if (!read_i32(f, &n_vocab) || !read_i32(f, &n_layer) ||
        !read_i32(f, &n_head) || !read_i32(f, &n_positions) ||
        !read_i32(f, &d_ff) || !read_i32(f, &d_model) || !read_i32(f, &ftype))
        return fail("truncated hparams");
    std::printf("hparams n_vocab=%d n_layer=%d n_head=%d n_positions=%d "
                "d_ff=%d d_model=%d ftype=%d\n",
                n_vocab, n_layer, n_head, n_positions, d_ff, d_model, ftype);

    // vocab: count, then {len, bytes}; shortfall padded with synthetic
    // [_extra_token_N] ids (biogpt.cpp:105-112)
    int32_t n_vocab_file;
    if (!read_i32(f, &n_vocab_file) || n_vocab_file > n_vocab)
        return fail("bad vocab count");
    uint64_t vh = 1469598103934665603ull;
    std::string word;
    for (int32_t i = 0; i < n_vocab_file; i++) {
        if (!read_str(f, &word)) return fail("truncated vocab");
        vh = fnv1a((const uint8_t*)word.data(), word.size(), vh);
        vh = fnv1a((const uint8_t*)"\x1f", 1, vh);
    }
    int32_t n_extra = n_vocab - n_vocab_file;
    std::printf("vocab n=%d extra=%d hash=%016llx\n", n_vocab_file, n_extra,
                (unsigned long long)vh);

    // merges: count, then {len, "first second"} (biogpt.cpp:116-156);
    // n_merges is NOT an hparam — the count lives only here
    int32_t n_merges;
    if (!read_i32(f, &n_merges) || n_merges < 0)
        return fail("bad merges count");
    uint64_t mh = 1469598103934665603ull;
    for (int32_t i = 0; i < n_merges; i++) {
        if (!read_str(f, &word)) return fail("truncated merges");
        if (word.find(' ') == std::string::npos)
            return fail("merge entry without separator");
        mh = fnv1a((const uint8_t*)word.data(), word.size(), mh);
        mh = fnv1a((const uint8_t*)"\x1f", 1, mh);
    }
    std::printf("merges n=%d hash=%016llx\n", n_merges,
                (unsigned long long)mh);

    // tensor records until EOF (biogpt.cpp:369-434)
    std::vector<uint8_t> data;
    int n_tensors = 0;
    for (;;) {
        int32_t n_dims;
        if (std::fread(&n_dims, 4, 1, f) != 1) break;   // clean EOF
        int32_t name_len, ttype;
        if (!read_i32(f, &name_len) || !read_i32(f, &ttype))
            return fail("truncated tensor header");
        if (n_dims < 1 || n_dims > 2) return fail("bad n_dims");
        if (!type_name(ttype)) return fail("unknown tensor type");
        int64_t nelements = 1;
        int32_t dims[2] = {1, 1};
        for (int32_t i = 0; i < n_dims; i++) {
            if (!read_i32(f, &dims[i]) || dims[i] <= 0)
                return fail("bad dim");
            nelements *= dims[i];
        }
        std::string name;
        name.resize(name_len);
        if (name_len <= 0 ||
            std::fread(&name[0], 1, name_len, f) != (size_t)name_len)
            return fail("truncated tensor name");
        // dims are stored reversed vs torch (convert.py:80): dims[0] is the
        // row length the codecs block over (biogpt.cpp:568)
        const int64_t nbytes = tensor_nbytes(ttype, nelements, dims[0]);
        if (nbytes < 0) return fail("invalid quantized row length");
        data.resize(nbytes);
        if (std::fread(data.data(), 1, nbytes, f) != (size_t)nbytes)
            return fail("truncated tensor data");
        std::printf("tensor %s dims=%dx%d type=%s bytes=%lld "
                    "hash=%016llx\n",
                    name.c_str(), dims[0], dims[1], type_name(ttype),
                    (long long)nbytes,
                    (unsigned long long)fnv1a(data.data(), nbytes));
        n_tensors++;
    }
    std::printf("tensors n=%d\n", n_tensors);
    std::fclose(f);
    return 0;
}
