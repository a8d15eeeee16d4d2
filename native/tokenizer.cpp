// Byte-level BPE tokenizer — native host-side runtime component.
//
// Tokenization sits on the serving critical path (every request, every
// detokenized stream chunk) and is pure host CPU work; the reference has
// no runtime at all (SURVEY.md §1), so this is north-star scope. C ABI,
// loaded from Python via ctypes (runtime/tokenizer.py) — no pybind11
// dependency.
//
// Model: greedy lowest-rank byte-pair merging (GPT-2/Llama-style BPE)
// over raw bytes. Vocab = 256 byte tokens + one token per merge rule.
// The Python wrapper handles vocab-file parsing and passes flat merge
// tables.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
    // merge table: (left, right) -> (rank, new_id)
    std::unordered_map<uint64_t, std::pair<uint32_t, uint32_t>> merges;

    static uint64_t key(uint32_t a, uint32_t b) {
        return (static_cast<uint64_t>(a) << 32) | b;
    }
};

}  // namespace

extern "C" {

// Build a tokenizer from flat merge arrays (lefts[i], rights[i]) -> ids[i],
// ranked by position. Returns an opaque handle.
void* tok_create(const uint32_t* lefts, const uint32_t* rights,
                 const uint32_t* ids, uint32_t n_merges) {
    auto* t = new Tokenizer();
    t->merges.reserve(n_merges * 2);
    for (uint32_t i = 0; i < n_merges; ++i) {
        t->merges.emplace(Tokenizer::key(lefts[i], rights[i]),
                          std::make_pair(i, ids[i]));
    }
    return t;
}

void tok_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode UTF-8 bytes into token ids. Returns the number of tokens written
// (<= n_bytes; out must have room for n_bytes entries).
uint32_t tok_encode(void* handle, const uint8_t* bytes, uint32_t n_bytes,
                    uint32_t* out) {
    auto* t = static_cast<Tokenizer*>(handle);
    if (n_bytes == 0) return 0;

    std::vector<uint32_t> toks(bytes, bytes + n_bytes);

    // Greedy lowest-rank merging. O(n * n_merge_rounds); adjacent-pair
    // rescan per round, fine for prompt-sized inputs.
    for (;;) {
        uint32_t best_rank = UINT32_MAX;
        size_t best_pos = 0;
        for (size_t i = 0; i + 1 < toks.size(); ++i) {
            auto it = t->merges.find(Tokenizer::key(toks[i], toks[i + 1]));
            if (it != t->merges.end() && it->second.first < best_rank) {
                best_rank = it->second.first;
                best_pos = i;
            }
        }
        if (best_rank == UINT32_MAX) break;
        auto it = t->merges.find(
            Tokenizer::key(toks[best_pos], toks[best_pos + 1]));
        toks[best_pos] = it->second.second;
        toks.erase(toks.begin() + best_pos + 1);
    }

    std::memcpy(out, toks.data(), toks.size() * sizeof(uint32_t));
    return static_cast<uint32_t>(toks.size());
}

// Encode from an ARBITRARY initial token-id sequence (real vocabularies —
// HF tokenizer.json — give byte-level tokens arbitrary ids, not 0..255;
// the Python wrapper maps raw bytes to their byte-token ids first).
// Merges in place; returns the number of tokens written to out.
uint32_t tok_encode_ids(void* handle, const uint32_t* ids, uint32_t n_ids,
                        uint32_t* out) {
    auto* t = static_cast<Tokenizer*>(handle);
    if (n_ids == 0) return 0;
    std::vector<uint32_t> toks(ids, ids + n_ids);
    for (;;) {
        uint32_t best_rank = UINT32_MAX;
        size_t best_pos = 0;
        for (size_t i = 0; i + 1 < toks.size(); ++i) {
            auto it = t->merges.find(Tokenizer::key(toks[i], toks[i + 1]));
            if (it != t->merges.end() && it->second.first < best_rank) {
                best_rank = it->second.first;
                best_pos = i;
            }
        }
        if (best_rank == UINT32_MAX) break;
        auto it = t->merges.find(
            Tokenizer::key(toks[best_pos], toks[best_pos + 1]));
        toks[best_pos] = it->second.second;
        toks.erase(toks.begin() + best_pos + 1);
    }
    std::memcpy(out, toks.data(), toks.size() * sizeof(uint32_t));
    return static_cast<uint32_t>(toks.size());
}

// Batch encode: inputs are concatenated byte buffers with offsets
// (n_inputs+1 entries). Outputs are written contiguously; out_offsets
// (n_inputs+1) receives token offsets.
void tok_encode_batch(void* handle, const uint8_t* bytes,
                      const uint32_t* offsets, uint32_t n_inputs,
                      uint32_t* out, uint32_t* out_offsets) {
    uint32_t pos = 0;
    out_offsets[0] = 0;
    for (uint32_t i = 0; i < n_inputs; ++i) {
        uint32_t n = tok_encode(handle, bytes + offsets[i],
                                offsets[i + 1] - offsets[i], out + pos);
        pos += n;
        out_offsets[i + 1] = pos;
    }
}

}  // extern "C"
