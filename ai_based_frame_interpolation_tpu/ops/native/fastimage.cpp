// fastimage: native host-side kernels for the video pipeline's hot loop.
//
// The TPU does the math; the host must keep it fed. These are the per-frame
// byte-shuffling operations that sit between the decoder, the device, and
// the encoder — the reference leaves all of this to per-frame Python/numpy
// (SURVEY.md §2: its only native code lives inside pip dependencies):
//
//   - bgr_to_gray_u8:  BT.601 luma, decoder BGR -> model grayscale
//   - bgr_to_rgb_u8:   channel swap for the RGB model path
//   - pack_pairs_u8:   frames[0..n] -> two contiguous batched arrays
//                      (f[i], f[i+1]) ready for one H2D transfer
//   - interleave_u8:   originals + per-pair intermediates -> output frame
//                      order in one pass (the 2x/4x stream assembly)
//
// Single translation unit, no dependencies, OpenMP-free (one helper thread
// pool would fight the decoder's); compiled with -O3 -march=native at build
// or first use and loaded via ctypes (build.py). Every entry point has a
// numpy fallback so the framework never hard-requires the toolchain.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// BT.601 integer luma: y = (77 r + 150 g + 29 b + 128) >> 8
void bgr_to_gray_u8(const uint8_t* bgr, uint8_t* gray, int64_t npix) {
    for (int64_t i = 0; i < npix; ++i) {
        const uint8_t b = bgr[3 * i + 0];
        const uint8_t g = bgr[3 * i + 1];
        const uint8_t r = bgr[3 * i + 2];
        gray[i] = static_cast<uint8_t>((77 * r + 150 * g + 29 * b + 128) >> 8);
    }
}

void bgr_to_rgb_u8(const uint8_t* bgr, uint8_t* rgb, int64_t npix) {
    for (int64_t i = 0; i < npix; ++i) {
        rgb[3 * i + 0] = bgr[3 * i + 2];
        rgb[3 * i + 1] = bgr[3 * i + 1];
        rgb[3 * i + 2] = bgr[3 * i + 0];
    }
}

// frames: n_frames contiguous frames of frame_bytes each.
// out1 gets frames[0..n-2], out2 gets frames[1..n-1] (the consecutive pairs).
void pack_pairs_u8(const uint8_t* frames, uint8_t* out1, uint8_t* out2,
                   int64_t n_frames, int64_t frame_bytes) {
    const int64_t n_pairs = n_frames - 1;
    if (n_pairs <= 0) return;
    std::memcpy(out1, frames, static_cast<size_t>(n_pairs * frame_bytes));
    std::memcpy(out2, frames + frame_bytes,
                static_cast<size_t>(n_pairs * frame_bytes));
}

// originals: n_pairs+1 frames; mids: [n_pairs, k] intermediate frames.
// out receives n_pairs*(k+1)+1 frames in playback order:
//   orig[0], mids[0][0..k-1], orig[1], mids[1][0..k-1], ..., orig[n_pairs]
void interleave_u8(const uint8_t* originals, const uint8_t* mids,
                   uint8_t* out, int64_t n_pairs, int64_t k,
                   int64_t frame_bytes) {
    const size_t fb = static_cast<size_t>(frame_bytes);
    uint8_t* dst = out;
    for (int64_t p = 0; p < n_pairs; ++p) {
        std::memcpy(dst, originals + p * frame_bytes, fb);
        dst += frame_bytes;
        std::memcpy(dst, mids + p * k * frame_bytes,
                    static_cast<size_t>(k * frame_bytes));
        dst += k * frame_bytes;
    }
    std::memcpy(dst, originals + n_pairs * frame_bytes, fb);
}

int fastimage_abi_version(void) { return 1; }

}  // extern "C"
