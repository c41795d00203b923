// vap_tpu native video decoder — the TPU-host replacement for decord
// (reference decodes via decord, finetrainers/data/dataset.py:802).
//
// libavformat/libavcodec demux+decode, libswscale RGB24 conversion with
// optional resize, a batch API that decodes multiple files on a std::thread
// pool so the host data pipeline keeps TPUs fed.
//
// C ABI (consumed from Python via ctypes — vap_tpu/native/__init__.py):
//   vap_video_info(path, &frames, &h, &w, &fps)       -> 0 / negative error
//   vap_decode_video(path, out, out_h, out_w,
//                    indices, n_indices)              -> frames written
//   vap_decode_batch(paths, n, outs, out_h, out_w,
//                    indices_per, n_indices_per, nthreads)
//
// Frames are written as uint8 RGB24 [n, out_h, out_w, 3], C-contiguous.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Demuxer {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    const AVCodecParameters* par = fmt->streams[stream_index]->codecpar;
    const AVCodec* dec = avcodec_find_decoder(par->codec_id);
    if (!dec) return -4;
    codec = avcodec_alloc_context3(dec);
    if (!codec || avcodec_parameters_to_context(codec, par) < 0) return -5;
    codec->thread_count = 0;  // auto
    if (avcodec_open2(codec, dec, nullptr) < 0) return -6;
    return 0;
  }

  ~Demuxer() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

double stream_fps(const AVStream* st) {
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  if (r.num <= 0 || r.den <= 0) return 16.0;
  return av_q2d(r);
}

}  // namespace

extern "C" {

int vap_video_info(const char* path, int* num_frames, int* height, int* width, double* fps) {
  Demuxer d;
  int rc = d.open(path);
  if (rc < 0) return rc;
  AVStream* st = d.fmt->streams[d.stream_index];
  *height = d.codec->height;
  *width = d.codec->width;
  *fps = stream_fps(st);

  int64_t nb = st->nb_frames;
  if (nb > 0) {
    *num_frames = static_cast<int>(nb);
    return 0;
  }
  // fall back to a demux-only count (no decode)
  int count = 0;
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) ++count;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  *num_frames = count;
  return 0;
}

// Decode `path`; for each k in [0, n_indices) write decoded frame
// indices[k] (sorted ascending) resized to (out_h, out_w) RGB24 into
// out + k*out_h*out_w*3. indices == nullptr decodes the first n_indices
// frames. Returns frames written, or negative error.
int vap_decode_video(const char* path, uint8_t* out, int out_h, int out_w,
                     const int* indices, int n_indices) {
  Demuxer d;
  int rc = d.open(path);
  if (rc < 0) return rc;

  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  const size_t frame_bytes = static_cast<size_t>(out_h) * out_w * 3;

  // sws_scale's SIMD paths can write past the end of rows whose stride is
  // not SIMD-aligned (out_w*3 = 120 bytes at out_w=40 smashed the heap of
  // the caller's tightly-packed numpy buffer). Scale into an av_image_alloc
  // buffer with 64-byte row alignment, then copy the tight rows out.
  uint8_t* tmp_data[4] = {nullptr, nullptr, nullptr, nullptr};
  int tmp_linesize[4] = {0, 0, 0, 0};
  if (av_image_alloc(tmp_data, tmp_linesize, out_w, out_h, AV_PIX_FMT_RGB24, 64) < 0) {
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return -7;  // distinct from Demuxer::open's -5 (codec-context failure)
  }

  int decoded = 0;   // source frame counter
  int written = 0;   // output slot
  bool done = false;

  auto handle_frame = [&](AVFrame* f) {
    while (written < n_indices) {
      int want = indices ? indices[written] : written;
      if (want != decoded) break;
      if (!sws) {
        sws = sws_getContext(f->width, f->height, static_cast<AVPixelFormat>(f->format),
                             out_w, out_h, AV_PIX_FMT_RGB24, SWS_AREA, nullptr, nullptr, nullptr);
      }
      sws_scale(sws, f->data, f->linesize, 0, f->height, tmp_data, tmp_linesize);
      uint8_t* dst = out + static_cast<size_t>(written) * frame_bytes;
      for (int r = 0; r < out_h; ++r)
        std::memcpy(dst + static_cast<size_t>(r) * out_w * 3,
                    tmp_data[0] + static_cast<size_t>(r) * tmp_linesize[0],
                    static_cast<size_t>(out_w) * 3);
      ++written;
    }
    ++decoded;
    if (written >= n_indices) done = true;
  };

  while (!done && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) {
      if (avcodec_send_packet(d.codec, pkt) == 0) {
        while (avcodec_receive_frame(d.codec, frame) == 0) {
          handle_frame(frame);
          if (done) break;
        }
      }
    }
    av_packet_unref(pkt);
  }
  // drain
  if (!done) {
    avcodec_send_packet(d.codec, nullptr);
    while (!done && avcodec_receive_frame(d.codec, frame) == 0) handle_frame(frame);
  }

  if (sws) sws_freeContext(sws);
  av_freep(&tmp_data[0]);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return written;
}

// Decode n files concurrently on up to `nthreads` workers.
// outs[i] receives n_indices_per[i] frames; indices_per[i] may be nullptr.
// results[i] = frames written or negative error.
void vap_decode_batch(const char** paths, int n, uint8_t** outs, int out_h, int out_w,
                      const int** indices_per, const int* n_indices_per,
                      int nthreads, int* results) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      results[i] = vap_decode_video(paths[i], outs[i], out_h, out_w,
                                    indices_per ? indices_per[i] : nullptr,
                                    n_indices_per[i]);
    }
  };
  int workers = nthreads > 0 ? (nthreads < n ? nthreads : n) : 1;
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
