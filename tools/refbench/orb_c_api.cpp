// Thin C API around the reference ORB extractor so the reference
// pipeline can be *measured* on this machine (its vendored pybind11
// predates Python 3.12).  Used only by tools/refbench; not part of the
// framework.
#include <opencv2/core/core.hpp>
#include <vector>
#include <cstring>
#include "ORBextractor.h"

using namespace ORB_SLAM2;

extern "C" {

void* orb_create(int nfeatures, float scale, int nlevels, int ini_th, int min_th) {
    return new ORBextractor(nfeatures, scale, nlevels, ini_th, min_th);
}

void orb_destroy(void* h) { delete static_cast<ORBextractor*>(h); }

// runs extraction; returns number of keypoints. caller buffers:
// kps: [cap x 7] float (x, y, size, angle, response, octave, class_id)
// desc: [cap x 32] uint8
int orb_extract(void* h, const unsigned char* img, int rows, int cols,
                float* kps, unsigned char* desc, int cap) {
    ORBextractor* ex = static_cast<ORBextractor*>(h);
    cv::Mat image(rows, cols, CV_8UC1, const_cast<unsigned char*>(img));
    std::vector<cv::KeyPoint> keypoints;
    cv::Mat descriptors;
    ex->operator_kd(image, cv::Mat(), keypoints, descriptors);
    int n = std::min(static_cast<int>(keypoints.size()), cap);
    for (int i = 0; i < n; ++i) {
        const cv::KeyPoint& k = keypoints[i];
        float* row = kps + 7 * i;
        row[0] = k.pt.x; row[1] = k.pt.y; row[2] = k.size;
        row[3] = k.angle; row[4] = k.response;
        row[5] = static_cast<float>(k.octave);
        row[6] = static_cast<float>(k.class_id);
        std::memcpy(desc + 32 * i, descriptors.ptr<unsigned char>(i), 32);
    }
    return n;
}

int orb_levels(void* h) { return static_cast<ORBextractor*>(h)->GetLevels(); }
float orb_scale(void* h) { return static_cast<ORBextractor*>(h)->GetScaleFactor(); }

// copy pyramid level l into out (must be sized rows*cols of that level)
int orb_pyramid_level(void* h, int level, unsigned char* out, int* rows, int* cols) {
    ORBextractor* ex = static_cast<ORBextractor*>(h);
    if (level < 0 || level >= (int)ex->mvImagePyramid.size()) return -1;
    cv::Mat m = ex->mvImagePyramid[level];
    *rows = m.rows; *cols = m.cols;
    if (out) {
        for (int r = 0; r < m.rows; ++r)
            std::memcpy(out + r * m.cols, m.ptr<unsigned char>(r), m.cols);
    }
    return 0;
}

}  // extern "C"
