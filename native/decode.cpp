// Native video decode stage (first-party equivalent of the reference's
// decord dependency — a C++ ffmpeg wrapper, utils/dc_utils.py:10,20-38).
//
// Decodes H.264/any-libav video straight to packed RGB24 with fps-ratio
// frame striding applied in the decode loop, so skipped frames never cross
// the C/python boundary.  Colorspace conversion runs through swscale —
// the same path OpenCV's FFmpeg backend uses, so pixels match the cv2
// fallback decoder.  Codec-internal threading is enabled (thread_count=0).
//
// C ABI (ctypes):
//   vda_video_open(path, &w, &h, &fps)  -> opaque handle (NULL on error)
//   vda_video_read(handle, buf, max_frames, stride) -> frames written
//        (repeat until it returns < max_frames; buf is n*h*w*3 uint8)
//   vda_video_close(handle)

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <deque>
#include <mutex>
#include <thread>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct VdaVideo {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* codec = nullptr;
    SwsContext* sws = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int stream_idx = -1;
    int width = 0;
    int height = 0;
    int64_t decoded_idx = 0;  // index over decoded frames (striding base)
    bool eof_sent = false;
    bool done = false;

    // decode→convert pipeline: the caller thread runs sws_scale on queued
    // frames while this worker keeps the decoder busy (the two stages cost
    // about the same, so overlapping them ~halves wall time per frame).
    std::thread worker;
    std::mutex mu;
    std::condition_variable cv_put, cv_get;
    std::deque<AVFrame*> ready;  // sampled frames awaiting conversion
    bool stop = false;
    bool decode_err = false;
    static constexpr size_t kQueueCap = 4;
};

void destroy(VdaVideo* v) {
    if (!v) return;
    {
        std::lock_guard<std::mutex> lock(v->mu);
        v->stop = true;
    }
    v->cv_put.notify_all();
    v->cv_get.notify_all();
    if (v->worker.joinable()) v->worker.join();
    for (AVFrame* f : v->ready) av_frame_free(&f);
    if (v->sws) sws_freeContext(v->sws);
    if (v->frame) av_frame_free(&v->frame);
    if (v->pkt) av_packet_free(&v->pkt);
    if (v->codec) avcodec_free_context(&v->codec);
    if (v->fmt) avformat_close_input(&v->fmt);
    delete v;
}

// Worker: decode packets, apply frame striding, queue sampled frames for
// the caller thread to convert.
void decode_loop(VdaVideo* v, int stride) {
    while (true) {
        int ret = avcodec_receive_frame(v->codec, v->frame);
        if (ret == 0) {
            bool sampled = (v->decoded_idx % stride == 0);
            ++v->decoded_idx;
            if (sampled) {
                AVFrame* f = av_frame_alloc();
                av_frame_move_ref(f, v->frame);
                std::unique_lock<std::mutex> lock(v->mu);
                v->cv_put.wait(lock, [v] {
                    return v->ready.size() < VdaVideo::kQueueCap || v->stop;
                });
                if (v->stop) {
                    av_frame_free(&f);
                    return;
                }
                v->ready.push_back(f);
                lock.unlock();
                v->cv_get.notify_one();
            } else {
                av_frame_unref(v->frame);
            }
            continue;
        }
        if (ret == AVERROR_EOF) break;
        if (ret != AVERROR(EAGAIN)) {
            std::lock_guard<std::mutex> lock(v->mu);
            v->decode_err = true;
            break;
        }
        if (v->eof_sent) continue;
        ret = av_read_frame(v->fmt, v->pkt);
        if (ret < 0) {
            avcodec_send_packet(v->codec, nullptr);  // flush
            v->eof_sent = true;
            continue;
        }
        if (v->pkt->stream_index == v->stream_idx) {
            if (avcodec_send_packet(v->codec, v->pkt) < 0) {
                av_packet_unref(v->pkt);
                std::lock_guard<std::mutex> lock(v->mu);
                v->decode_err = true;
                break;
            }
        }
        av_packet_unref(v->pkt);
    }
    {
        std::lock_guard<std::mutex> lock(v->mu);
        v->done = true;
    }
    v->cv_get.notify_all();
}

// Convert the decoded frame into the RGB24 slot; lazily (re)creates the
// swscale context (some streams change pixel format mid-stream).
bool to_rgb(VdaVideo* v, AVFrame* f, uint8_t* dst) {
    v->sws = sws_getCachedContext(
        v->sws, f->width, f->height, static_cast<AVPixelFormat>(f->format),
        v->width, v->height, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
        nullptr);
    if (!v->sws) return false;
    uint8_t* dst_data[4] = {dst, nullptr, nullptr, nullptr};
    int dst_linesize[4] = {3 * v->width, 0, 0, 0};
    sws_scale(v->sws, f->data, f->linesize, 0, f->height, dst_data,
              dst_linesize);
    return true;
}

}  // namespace

extern "C" {

void* vda_video_open(const char* path, int* out_w, int* out_h,
                     double* out_fps) {
    auto* v = new VdaVideo();
    if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
        destroy(v);
        return nullptr;
    }
    if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
        destroy(v);
        return nullptr;
    }
    const AVCodec* dec = nullptr;
    v->stream_idx =
        av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (v->stream_idx < 0 || !dec) {
        destroy(v);
        return nullptr;
    }
    AVStream* st = v->fmt->streams[v->stream_idx];
    v->codec = avcodec_alloc_context3(dec);
    if (!v->codec ||
        avcodec_parameters_to_context(v->codec, st->codecpar) < 0) {
        destroy(v);
        return nullptr;
    }
    { const char* tc = getenv("VDA_DECODE_THREADS"); v->codec->thread_count = tc ? atoi(tc) : 0; }
    v->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(v->codec, dec, nullptr) < 0) {
        destroy(v);
        return nullptr;
    }
    v->pkt = av_packet_alloc();
    v->frame = av_frame_alloc();
    v->width = v->codec->width;
    v->height = v->codec->height;
    AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate
                                          : st->r_frame_rate;
    *out_w = v->width;
    *out_h = v->height;
    *out_fps = r.den ? av_q2d(r) : 30.0;
    return v;
}

// Fills up to max_frames sampled frames (every stride-th decoded frame)
// into buf; returns the number written (short count => end of stream),
// -1 on decode error.  The first call fixes the stride and starts the
// decode worker; conversion (sws_scale) runs on the calling thread,
// overlapped with decoding.
long vda_video_read(void* handle, uint8_t* buf, long max_frames,
                    int stride) {
    auto* v = static_cast<VdaVideo*>(handle);
    if (!v || max_frames <= 0) return 0;
    if (stride < 1) stride = 1;
    if (!v->worker.joinable()) {
        v->worker = std::thread(decode_loop, v, stride);
    }
    const size_t frame_bytes =
        static_cast<size_t>(v->width) * v->height * 3;
    long written = 0;

    while (written < max_frames) {
        AVFrame* f = nullptr;
        {
            std::unique_lock<std::mutex> lock(v->mu);
            v->cv_get.wait(lock, [v] {
                return !v->ready.empty() || v->done || v->decode_err;
            });
            if (v->decode_err) return -1;
            if (v->ready.empty()) break;  // done and drained
            f = v->ready.front();
            v->ready.pop_front();
        }
        v->cv_put.notify_one();
        bool ok = to_rgb(v, f, buf + written * frame_bytes);
        av_frame_free(&f);
        if (!ok) return -1;
        ++written;
    }
    return written;
}

void vda_video_close(void* handle) { destroy(static_cast<VdaVideo*>(handle)); }

}  // extern "C"
