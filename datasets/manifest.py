"""Dataset catalog manifest: one entry per reference dataset dir
(/root/reference/datasets/readme.md, 60 datasets).  URLs are the
reference's public BCE-bucket sources; ref_scripts lists the
upstream preprocess scripts whose behavior datasets/fetch.py's
postprocess hooks reproduce where our readers need it."""

MANIFEST =  {
  "Adult": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Adult/adult.data"
    ],
    "ref_scripts": []
  },
  "Ali_Display_Ad_Click": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/dmr/dataset_full.zip"
    ],
    "ref_scripts": [
      "get_data.sh"
    ]
  },
  "Ali_Display_Ad_Click_DSIN": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Ali_Display_Ad_Click/model_input.tar.gz"
    ],
    "ref_scripts": [
      "get_data.sh"
    ]
  },
  "AmazonBook": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/AmazonBook/AmazonBook.tar.gz"
    ],
    "ref_scripts": [
      "preprocess.py"
    ]
  },
  "Anime": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Anime/archive.zip"
    ],
    "ref_scripts": []
  },
  "Avazu": {
    "urls": [],
    "ref_scripts": []
  },
  "Avazu_flen": {
    "urls": [],
    "ref_scripts": [
      "preprocess.py"
    ]
  },
  "BQ_dssm": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/dssm/train.txt",
      "https://paddlerec.bj.bcebos.com/dssm/test.txt",
      "https://paddlerec.bj.bcebos.com/dssm/label.txt"
    ],
    "ref_scripts": [
      "data_process.sh",
      "preprocess.py"
    ]
  },
  "BQ_simnet": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/BQ/simnet/train.txt",
      "https://paddlerec.bj.bcebos.com/datasets/BQ/simnet/test.txt",
      "https://paddlerec.bj.bcebos.com/datasets/BQ/simnet/label.txt",
      "https://paddlerec.bj.bcebos.com/datasets/BQ/simnet/testquery.txt"
    ],
    "ref_scripts": [
      "data_process.sh",
      "preprocess.py"
    ]
  },
  "Beauty": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Beauty/beauty.txt"
    ],
    "ref_scripts": [
      "data_augment_candi_gen.py"
    ]
  },
  "Douban": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Douban/DMSC.csv"
    ],
    "ref_scripts": []
  },
  "Epinions": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Epinions/soc-Epinions1.txt.gz"
    ],
    "ref_scripts": []
  },
  "FourSquare": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/FourSquare/FourSquare.zip"
    ],
    "ref_scripts": []
  },
  "Gowalla": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Gowalla/loc-gowalla_totalCheckins.txt.gz"
    ],
    "ref_scripts": []
  },
  "Imagenet": {
    "urls": [
      "https://image-net.org/data/ILSVRC/2012/ILSVRC2012_img_train.tar",
      "https://image-net.org/data/ILSVRC/2012/ILSVRC2012_img_val.tar"
    ],
    "ref_scripts": []
  },
  "JD": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/JD/jdata_tfrecord.zip"
    ],
    "ref_scripts": []
  },
  "Jester": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Jester/Dataset3JokeSet.zip",
      "https://paddlerec.bj.bcebos.com/datasets/Jester/JesterDataset3.zip"
    ],
    "ref_scripts": []
  },
  "KDD2012_track2": {
    "urls": [
      "https://blog.cos.bamlubi.cn/Paddle-DPIN/kdd2012_2.zip"
    ],
    "ref_scripts": [
      "preprocess.py"
    ]
  },
  "LFM_1b": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/LFM_1b/LFM-1b.zip",
      "https://paddlerec.bj.bcebos.com/datasets/LFM_1b/LFM-1b_LEs.z01",
      "https://paddlerec.bj.bcebos.com/datasets/LFM_1b/LFM-1b_LEs.z02",
      "https://paddlerec.bj.bcebos.com/datasets/LFM_1b/LFM-1b_LEs.zip"
    ],
    "ref_scripts": []
  },
  "LFM_1b_UGP": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/LFM_1b_UGP/LFM-1b_UGP.zip"
    ],
    "ref_scripts": []
  },
  "LastFM": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/LastFM/lastfm-2k.zip"
    ],
    "ref_scripts": []
  },
  "LastFM_MHCN": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/LastFM_MHCN/lastfm.zip"
    ],
    "ref_scripts": []
  },
  "Lookalike": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/lookalike/metaheac_data.zip"
    ],
    "ref_scripts": []
  },
  "MIND": {
    "urls": [],
    "ref_scripts": []
  },
  "Multi_MNIST_DselectK": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Multi_Mnist_Dselet_K/multi_mnist.zip"
    ],
    "ref_scripts": []
  },
  "Netflix": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Netflix/Netflix.zip"
    ],
    "ref_scripts": []
  },
  "Netflix_deeprec": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Netflix-DeepRec/nf_prize_dataset.tar.gz"
    ],
    "ref_scripts": [
      "netflix_data_convert.py"
    ]
  },
  "Phishing_Websites": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Phishing_Websites/train.arff"
    ],
    "ref_scripts": []
  },
  "Pinterest": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Pinterest/pinterest-20.train.rating"
    ],
    "ref_scripts": []
  },
  "Retailrocket": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Retailrocket/Retailrocket.zip"
    ],
    "ref_scripts": []
  },
  "Steam": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/steam/steam_games.json.gz",
      "https://paddlerec.bj.bcebos.com/datasets/steam/steam_reviews.json.gz"
    ],
    "ref_scripts": []
  },
  "TaFeng": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/tafeng/ta_feng_all_months_merged.csv"
    ],
    "ref_scripts": []
  },
  "Taobao": {
    "urls": [],
    "ref_scripts": []
  },
  "YOOCHOOSE": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/yoochose/yoochoose-data.zip"
    ],
    "ref_scripts": []
  },
  "Yelp": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/Yelp/Yelp_covid_19.tar"
    ],
    "ref_scripts": []
  },
  "ag_news": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/tagspace/train.csv",
      "https://paddlerec.bj.bcebos.com/tagspace/test.csv"
    ],
    "ref_scripts": [
      "data_process.sh",
      "text2paddle.py"
    ]
  },
  "ali-ccp": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/esmm/traindata_10w.csv",
      "https://paddlerec.bj.bcebos.com/esmm/testdata_10w.csv"
    ],
    "ref_scripts": []
  },
  "ali-cpp_aitm": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/aitm/ctr_cvr.train",
      "https://paddlerec.bj.bcebos.com/datasets/aitm/ctr_cvr.test"
    ],
    "ref_scripts": [
      "data_process.sh",
      "process_public_data.py"
    ]
  },
  "amazonElec_Din": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/amazonelec_din/paddle_train.txt",
      "https://paddlerec.bj.bcebos.com/datasets/amazonelec_din/paddle_test.txt"
    ],
    "ref_scripts": [
      "build_dataset.py",
      "convert_pd.py",
      "data_process.sh",
      "remap_id.py"
    ]
  },
  "book-crossing": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/book-crossing/BX-CSV-Dump.zip"
    ],
    "ref_scripts": []
  },
  "census": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/mmoe/test_data.csv",
      "https://paddlerec.bj.bcebos.com/mmoe/train_data.csv"
    ],
    "ref_scripts": [
      "data_preparation.py",
      "data_process.sh"
    ]
  },
  "criteo": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/criteo/slot_test_data_full.tar.gz",
      "https://paddlerec.bj.bcebos.com/datasets/criteo/slot_train_data_full.tar.gz"
    ],
    "ref_scripts": [
      "data_process.sh",
      "download.sh",
      "get_slot_data.py"
    ]
  },
  "criteo_autofis": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/criteo_8d/part0.tar",
      "https://paddlerec.bj.bcebos.com/datasets/criteo_8d/part1.tar",
      "https://paddlerec.bj.bcebos.com/datasets/criteo_8d/part2.tar",
      "https://paddlerec.bj.bcebos.com/datasets/criteo_8d/part3.tar",
      "https://paddlerec.bj.bcebos.com/datasets/criteo_8d/part4.tar",
      "https://paddlerec.bj.bcebos.com/datasets/criteo_8d/part5.tar"
    ],
    "ref_scripts": [
      "Criteo.py",
      "get_data.py"
    ]
  },
  "criteo_autoint": {
    "urls": [],
    "ref_scripts": [
      "convert2txt.py",
      "download.sh",
      "preprocess.py",
      "scale.py",
      "stratifiedKfold.py"
    ]
  },
  "criteo_dcn_v2": {
    "urls": [],
    "ref_scripts": [
      "download.sh",
      "get_slot_data.py"
    ]
  },
  "criteo_fgcnn": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/fgcnn/datapro.zip"
    ],
    "ref_scripts": []
  },
  "criteo_lr": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/criteo_lr/data_part1.tar.gz",
      "https://paddlerec.bj.bcebos.com/datasets/criteo_lr/data_part2.tar.gz"
    ],
    "ref_scripts": [
      "data_process.sh",
      "download.sh",
      "get_slot_data.py"
    ]
  },
  "iprec": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/IPREC/3_days.zip"
    ],
    "ref_scripts": []
  },
  "kim": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/kim/kim.zip"
    ],
    "ref_scripts": []
  },
  "letor07": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/match_pyramid/train.txt",
      "https://paddlerec.bj.bcebos.com/match_pyramid/test.txt",
      "https://paddlerec.bj.bcebos.com/match_pyramid/embedding.npy"
    ],
    "ref_scripts": [
      "data_process.sh",
      "process.py"
    ]
  },
  "ml-1m_ensfm": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/recall/ensfm/ml-1m-ensfm.tar.gz"
    ],
    "ref_scripts": []
  },
  "ml-1m_tisas": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/ml-m1-tisasrec/ml-1m.txt"
    ],
    "ref_scripts": []
  },
  "movielens": {
    "urls": [
      "http://files.grouplens.org/datasets/movielens/ml-1m.zip",
      "https://files.grouplens.org/datasets/movielens/ml-25m.zip"
    ],
    "ref_scripts": []
  },
  "movielens_pinterest_NCF": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/ncf/train_data.csv",
      "https://paddlerec.bj.bcebos.com/ncf/test_data.csv",
      "https://paddlerec.bj.bcebos.com/ncf/Data.zip"
    ],
    "ref_scripts": [
      "data_process.sh",
      "get_test_data.py",
      "get_train_data.py"
    ]
  },
  "omniglot": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/omniglot/omniglot.tar"
    ],
    "ref_scripts": [
      "download.sh",
      "preprocess.py"
    ]
  },
  "one_billion": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/word2vec/1-billion-word-language-modeling-benchmark-r13output.tar",
      "https://paddlerec.bj.bcebos.com/word2vec/test_dir.tar"
    ],
    "ref_scripts": [
      "preprocess.py"
    ]
  },
  "senti_clas": {
    "urls": [
      "https://paddlerec.bj.bcebos.com/datasets/senti_clas/senti_clas.tar.gz"
    ],
    "ref_scripts": [
      "data_process.sh",
      "preprocess.py"
    ]
  },
  "sign": {
    "urls": [
      "https://blog.cos.bamlubi.cn/Paddle-SIGN/ml-tag.zip"
    ],
    "ref_scripts": []
  }
}
