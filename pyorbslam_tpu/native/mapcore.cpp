// Native host-side map core: observation index, covisibility counting,
// and BA problem assembly.
//
// The TPU-native analog of the reference's C++ runtime components
// (pyORBExtractor / g2o are its native layer): device math lives in
// JAX/XLA, while the pointer-chasing bookkeeping the host must do per
// keyframe — landmark->observer index maintenance, shared-landmark
// covisibility counting (KeyFrame.update_connections semantics), and
// gathering the (cam, point, uvr, sigma) observation arrays for the
// Schur BA — runs here instead of Python dict loops.
//
// Exposed through a C ABI consumed via ctypes (pybind11 is not available
// in this environment).  One MapCore instance owns the observation index;
// feature-level arrays (keypoints, descriptors) stay in numpy.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Obs {
    int32_t kf;
    int32_t feat;
};

struct MapCore {
    int32_t n_features = 0;                      // feature slots per keyframe
    // landmark id -> observations (kf, feat)
    std::unordered_map<int32_t, std::vector<Obs>> lm_obs;
    // kf -> landmark per feature slot (dense, mirrors KeyFrameStore.obs_lm)
    std::unordered_map<int32_t, std::vector<int32_t>> kf_obs;
    // covisibility weights kf -> (kf -> weight)
    std::unordered_map<int32_t, std::unordered_map<int32_t, int32_t>> covis;

    std::vector<int32_t>& kf_row(int32_t kf) {
        auto it = kf_obs.find(kf);
        if (it == kf_obs.end()) {
            it = kf_obs.emplace(kf, std::vector<int32_t>(n_features, -1)).first;
        }
        return it->second;
    }
};

}  // namespace

extern "C" {

void* mapcore_new(int32_t n_features) {
    MapCore* m = new MapCore();
    m->n_features = n_features;
    return m;
}

void mapcore_free(void* h) { delete static_cast<MapCore*>(h); }

// Register a keyframe's observations: obs_lm[n_features] (-1 = none).
void mapcore_add_keyframe(void* h, int32_t kf, const int32_t* obs_lm) {
    MapCore* m = static_cast<MapCore*>(h);
    std::vector<int32_t>& row = m->kf_row(kf);
    for (int32_t f = 0; f < m->n_features; ++f) {
        int32_t lm = obs_lm[f];
        row[f] = lm;
        if (lm >= 0) {
            m->lm_obs[lm].push_back({kf, f});
        }
    }
}

void mapcore_add_observation(void* h, int32_t lm, int32_t kf, int32_t feat) {
    MapCore* m = static_cast<MapCore*>(h);
    m->kf_row(kf)[feat] = lm;
    m->lm_obs[lm].push_back({kf, feat});
}

void mapcore_erase_observation(void* h, int32_t lm, int32_t kf) {
    MapCore* m = static_cast<MapCore*>(h);
    auto it = m->lm_obs.find(lm);
    if (it == m->lm_obs.end()) return;
    auto& v = it->second;
    for (size_t i = 0; i < v.size(); ++i) {
        if (v[i].kf == kf) {
            auto kit = m->kf_obs.find(kf);
            if (kit != m->kf_obs.end() && kit->second[v[i].feat] == lm) {
                kit->second[v[i].feat] = -1;
            }
            v.erase(v.begin() + i);
            break;
        }
    }
    if (v.empty()) m->lm_obs.erase(it);
}

int32_t mapcore_n_observations(void* h, int32_t lm) {
    MapCore* m = static_cast<MapCore*>(h);
    auto it = m->lm_obs.find(lm);
    return it == m->lm_obs.end() ? 0 : static_cast<int32_t>(it->second.size());
}

// observers of a landmark -> out_kf/out_feat (cap entries); returns count
int32_t mapcore_observers(void* h, int32_t lm, int32_t* out_kf,
                          int32_t* out_feat, int32_t cap) {
    MapCore* m = static_cast<MapCore*>(h);
    auto it = m->lm_obs.find(lm);
    if (it == m->lm_obs.end()) return 0;
    int32_t n = std::min<int32_t>(cap, it->second.size());
    for (int32_t i = 0; i < n; ++i) {
        out_kf[i] = it->second[i].kf;
        out_feat[i] = it->second[i].feat;
    }
    return n;
}

// Recount covisibility for `kf` (KeyFrame.update_connections:145-203):
// weight(kf, other) = #shared landmarks; edges kept at weight >= th, or
// the single strongest edge if none pass.  Results are symmetric.
// Returns the number of neighbors written to out_ids/out_w (cap-bounded).
int32_t mapcore_update_connections(void* h, int32_t kf, int32_t th,
                                   int32_t* out_ids, int32_t* out_w,
                                   int32_t cap) {
    MapCore* m = static_cast<MapCore*>(h);
    auto kit = m->kf_obs.find(kf);
    if (kit == m->kf_obs.end()) return 0;

    std::unordered_map<int32_t, int32_t> counter;
    for (int32_t f = 0; f < m->n_features; ++f) {
        int32_t lm = kit->second[f];
        if (lm < 0) continue;
        auto oit = m->lm_obs.find(lm);
        if (oit == m->lm_obs.end()) continue;
        for (const Obs& o : oit->second) {
            if (o.kf != kf) counter[o.kf]++;
        }
    }
    if (counter.empty()) return 0;

    int32_t best_kf = -1, best_w = 0;
    std::vector<std::pair<int32_t, int32_t>> edges;  // (weight, kf)
    for (auto& kv : counter) {
        if (kv.second > best_w) { best_w = kv.second; best_kf = kv.first; }
        if (kv.second >= th) edges.push_back({kv.second, kv.first});
    }
    if (edges.empty()) edges.push_back({best_w, best_kf});
    std::sort(edges.begin(), edges.end(),
              [](auto& a, auto& b) { return a.first > b.first; });

    // rewrite this kf's covis row + mirror edges
    auto& row = m->covis[kf];
    for (auto& kv : row) m->covis[kv.first].erase(kf);
    row.clear();
    int32_t n = 0;
    for (auto& e : edges) {
        row[e.second] = e.first;
        m->covis[e.second][kf] = e.first;
        if (n < cap) {
            out_ids[n] = e.second;
            out_w[n] = e.first;
            ++n;
        }
    }
    return n;
}

// Ordered covisible neighbors (weight desc); returns count
int32_t mapcore_neighbors(void* h, int32_t kf, int32_t* out_ids,
                          int32_t* out_w, int32_t cap) {
    MapCore* m = static_cast<MapCore*>(h);
    auto it = m->covis.find(kf);
    if (it == m->covis.end()) return 0;
    std::vector<std::pair<int32_t, int32_t>> edges;
    edges.reserve(it->second.size());
    for (auto& kv : it->second) edges.push_back({kv.second, kv.first});
    std::sort(edges.begin(), edges.end(),
              [](auto& a, auto& b) { return a.first > b.first; });
    int32_t n = std::min<int32_t>(cap, edges.size());
    for (int32_t i = 0; i < n; ++i) {
        out_ids[i] = edges[i].second;
        out_w[i] = edges[i].first;
    }
    return n;
}

// Assemble stereo-only BA observations for (cams x points).
//   cam_ids[nc]: keyframes in problem order; pnt_ids[np]: landmarks.
//   u_right: dense [max_kf x n_features] float32 (row stride = n_features)
//   Outputs (cap-bounded): obs_cam (problem cam index), obs_pnt (problem
//   point index), obs_kf/obs_feat (for host bookkeeping).  Returns count.
int32_t mapcore_assemble_obs(void* h, const int32_t* cam_ids, int32_t nc,
                             const int32_t* pnt_ids, int32_t np,
                             const float* u_right, int32_t ur_stride,
                             int32_t* obs_cam, int32_t* obs_pnt,
                             int32_t* obs_kf, int32_t* obs_feat,
                             int32_t cap) {
    MapCore* m = static_cast<MapCore*>(h);
    std::unordered_map<int32_t, int32_t> cam_index;
    cam_index.reserve(nc * 2);
    for (int32_t i = 0; i < nc; ++i) cam_index[cam_ids[i]] = i;
    int32_t n = 0;
    for (int32_t p = 0; p < np && n < cap; ++p) {
        auto it = m->lm_obs.find(pnt_ids[p]);
        if (it == m->lm_obs.end()) continue;
        for (const Obs& o : it->second) {
            auto ci = cam_index.find(o.kf);
            if (ci == cam_index.end()) continue;
            if (u_right[static_cast<int64_t>(o.kf) * ur_stride + o.feat] <= 0)
                continue;
            if (n >= cap) break;
            obs_cam[n] = ci->second;
            obs_pnt[n] = p;
            obs_kf[n] = o.kf;
            obs_feat[n] = o.feat;
            ++n;
        }
    }
    return n;
}

}  // extern "C"
