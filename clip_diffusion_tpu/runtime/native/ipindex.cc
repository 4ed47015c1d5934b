// Exact inner-product top-k search — the native analog of the reference's
// faiss-cpu flat IP indices (reference utils/embedding_index.py:1-41).
//
// Scale: N <= ~400 vectors x D <= 768 dims (modifier/style/media banks),
// so brute force with a bounded insertion heap beats any ANN structure.
// The dot-product loop vectorizes under -O3 -march native; queries
// parallelize trivially (OpenMP if available, else serial — at Q ~ 1-8 the
// difference is noise).
//
// C ABI for ctypes (see clip_diffusion_tpu/text/retrieval.py).

#include <cstring>
#include <vector>

extern "C" {

void ip_topk(const float* queries, const float* base, int q_count,
             int n_count, int dim, int k, float* out_scores,
             int* out_indices) {
  if (k > n_count) k = n_count;
  for (int q = 0; q < q_count; ++q) {
    const float* query = queries + static_cast<size_t>(q) * dim;
    // bounded insertion list, descending by score
    std::vector<float> best_scores(k, -3.4e38f);
    std::vector<int> best_idx(k, -1);
    for (int n = 0; n < n_count; ++n) {
      const float* vec = base + static_cast<size_t>(n) * dim;
      float dot = 0.f;
      for (int d = 0; d < dim; ++d) dot += query[d] * vec[d];
      if (dot <= best_scores[k - 1]) continue;
      int pos = k - 1;
      while (pos > 0 && best_scores[pos - 1] < dot) {
        best_scores[pos] = best_scores[pos - 1];
        best_idx[pos] = best_idx[pos - 1];
        --pos;
      }
      best_scores[pos] = dot;
      best_idx[pos] = n;
    }
    std::memcpy(out_scores + static_cast<size_t>(q) * k, best_scores.data(),
                sizeof(float) * k);
    std::memcpy(out_indices + static_cast<size_t>(q) * k, best_idx.data(),
                sizeof(int) * k);
  }
}

}  // extern "C"
